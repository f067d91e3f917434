"""Phase profile of the GROUPED MSM pipeline (the batched prover's round
dispatch): times cumulative prefixes of `ops/msm_grouped.grouped_core` at the
prover's round shapes to attribute the measured ~2.3 s/dispatch wall.

Run: CURDLEPROOFS_TPU_REAL=1 python scripts/grouped_profile.py [n_rel width]
Writes bench_grouped_phases.json.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/curdleproofs_jax_cache")
os.environ.setdefault("CURDLEPROOFS_TPU_REAL", "1")

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    n_rel = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.ops.g1_ops import use_pallas
    from curdleproofs_tpu.ops.msm_device import DeviceBases, use_madd
    from curdleproofs_tpu.ops.msm_grouped import (
        _W, _grouped_msm_jit, grouped_core, horner_device,
        pick_grouped_params, signed_digits_c4,
    )

    # resident bases at prover scale (pool tiled to batch size; gather
    # traffic and fold math are value-independent)
    rng = StdRng.seed_from_u64(3)
    pool = [rng.rand_g1() for _ in range(512)]
    n_bases = 256 * 4 * 252 + 512
    pts = [pool[i % len(pool)] for i in range(n_bases)]
    t0 = time.time()
    bases = DeviceBases(pts)
    print(f"bases up ({n_bases} pts): {time.time() - t0:.1f}s", flush=True)

    params = pick_grouped_params(n_rel, width, bases.n)
    print(f"params: {params}", flush=True)
    rnd = np.random.default_rng(7)
    cols = rnd.integers(0, n_bases, (params.n_rel, width)).astype(np.int32)
    sc = [int.from_bytes(rnd.bytes(32), "little") % R
          for _ in range(params.n_rel * width)]
    buf = b"".join(s.to_bytes(32, "little") for s in sc)
    limbs = np.frombuffer(buf, "<u2").reshape(
        params.n_rel, width, 16).transpose(2, 0, 1)
    limbs = jnp.asarray(np.ascontiguousarray(limbs))
    colsj = jnp.asarray(cols)
    pallas, madd = use_pallas(), use_madd()

    def _force(r):
        # block_until_ready does NOT drain the axon queue — force a real
        # sync with a host readback of one small leaf
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:8])

    def timeit(name, fn, *args):
        _force(fn(*args))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(fn(*args))
            walls.append(time.perf_counter() - t0)
        walls.sort()
        w = walls[len(walls) // 2]
        print(f"{name:>12}: {w * 1e3:8.1f} ms", flush=True)
        return w

    # prefix stages of the grouped program
    def digits_only(lb):
        return signed_digits_c4(
            lb.reshape(16, params.n_rel * width), params.n_rel * width)

    gp = dict(params=params, pallas=pallas, madd=madd)

    def core_only(px, py, zb, lb, cp):
        d = digits_only(lb).reshape(_W, params.n_rel, width) \
            .transpose(1, 0, 2)
        ws = grouped_core(px, py, zb, d, cp, **gp)
        return ws.x[0, :, 0]  # force core, skip horner

    def full(px, py, zb, lb, cp):
        return _grouped_msm_jit(
            px, py, zb, lb, cp, n_rel=params.n_rel, width=width,
            s_pad=params.s_pad, n_ext=params.n_ext, pallas=pallas, madd=madd)

    def plan_only(lb, cp):
        # digits + the whole integer plan build (ranks, slots, scatters),
        # stopping right before the point gathers/fold
        from jax import lax

        d = digits_only(lb).reshape(_W, params.n_rel, width) \
            .transpose(1, 0, 2)
        n_rel_, width_, s_pad_ = params.n_rel, params.width, params.s_pad
        rows, n_ext_ = params.rows, params.n_ext
        _B = 8
        _Tl = 8
        live = d != 0
        key = jnp.where(live, jnp.abs(d) - 1, _B)
        eidx = jnp.where(d < 0, cp[:, None, :] + n_ext_,
                         cp[:, None, :]) + jnp.zeros_like(key)
        rank = jnp.zeros_like(key)
        cnts = []
        for b in range(_B):
            m = key == b
            cs = jnp.cumsum(m.astype(jnp.int32), axis=-1)
            rank = jnp.where(m, cs - 1, rank)
            cnts.append(cs[..., -1])
        cnt = jnp.stack(cnts, axis=-1)
        slots_per_bucket = -(-cnt // _Tl)
        b_off = jnp.cumsum(slots_per_bucket, axis=-1) - slots_per_bucket
        row_slots = jnp.sum(slots_per_bucket, axis=-1).reshape(-1)
        row_off = (jnp.cumsum(row_slots) - row_slots).reshape(n_rel_, _W)
        cell_boff = jnp.take_along_axis(
            b_off, jnp.minimum(key, _B - 1), axis=-1)
        gslot = row_off[..., None] + cell_boff + rank // _Tl
        dest = jnp.where(live, (rank % _Tl) * s_pad_ + gslot, _Tl * s_pad_)
        plan = jnp.full((_Tl * s_pad_,), 2 * n_ext_, jnp.int32).at[
            dest.reshape(-1)].set(eidx.reshape(-1), mode="drop") \
            .reshape(_Tl, s_pad_)
        rowid = lax.broadcasted_iota(jnp.int32, (n_rel_, _W, width_), 0) \
            * _W + lax.broadcasted_iota(
                jnp.int32, (n_rel_, _W, width_), 1)
        gkey = jnp.where(live, rowid * _B + key, rows * _B + 9)
        sdest = jnp.where(live, gslot, s_pad_)
        slot_gkey = jnp.full((s_pad_,), rows * _B + 9, jnp.int32).at[
            sdest.reshape(-1)].set(gkey.reshape(-1), mode="drop")
        return plan[0, ::1024], slot_gkey[::1024]

    res = {"n_rel": params.n_rel, "width": width, "s_pad": params.s_pad}
    res["digits_ms"] = round(1e3 * timeit(
        "digits", jax.jit(digits_only), limbs), 1)
    res["plan_ms"] = round(1e3 * timeit(
        "plan", jax.jit(plan_only), limbs, colsj), 1)
    res["core_ms"] = round(1e3 * timeit(
        "core", jax.jit(core_only), bases.ext_px, bases.ext_py,
        bases.ext_zb, limbs, colsj), 1)
    res["full_ms"] = round(1e3 * timeit(
        "full", full, bases.ext_px, bases.ext_py, bases.ext_zb,
        limbs, colsj), 1)
    res["horner_ms"] = round(res["full_ms"] - res["core_ms"], 1)

    # fold-only: the pallas kernel at this family's [T=8, s_pad] shape
    from curdleproofs_tpu.ops.pallas_kernels import g1_fold_rows_madd_pallas

    plan = rnd.integers(0, 2 * bases.n, (8, params.s_pad)).astype(np.int32)

    def fold_only(px, py, zb, pl):
        gx = jnp.take(px, pl.reshape(-1), axis=1).reshape(12, *pl.shape)
        gy = jnp.take(py, pl.reshape(-1), axis=1).reshape(12, *pl.shape)
        gz = jnp.take(zb, pl.reshape(-1)).reshape(*pl.shape)
        return g1_fold_rows_madd_pallas(gx, gy, gz)[0][0]

    res["gather_fold_ms"] = round(1e3 * timeit(
        "gather+fold", jax.jit(fold_only), bases.ext_px, bases.ext_py,
        bases.ext_zb, jnp.asarray(plan)), 1)

    adds = 8 * params.s_pad
    res["fold_adds"] = adds
    if res["gather_fold_ms"] > 0:
        res["fold_adds_per_s_M"] = round(
            adds / (res["gather_fold_ms"] / 1e3) / 1e6, 1)
    print(json.dumps(res), flush=True)
    (REPO / "bench_grouped_phases.json").write_text(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
