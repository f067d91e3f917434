"""Phase profile of the device MSM pipeline (VERDICT r04 weak #1).

Times cumulative PREFIXES of `ops/msm_device._pipeline_core` on the real TPU
and diffs them to attribute the wall to: digit recode, bucket sort, slot-plan
scatters, the point gather, the Pallas bucket fold, the slot merge, and the
bucket reduction.  Run:

    CURDLEPROOFS_TPU_REAL=1 python scripts/msm_profile.py [logns...]

Writes bench_msm_phases.json with per-phase ms per (log_n, c) family.
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

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def build_prefix(stage: str, params, pallas: bool, madd: bool):
    """A jitted (ext_px, ext_py, ext_zb, limbs) -> outputs-of-`stage` fn.

    Mirrors _pipeline_core stage by stage; each prefix returns the live
    intermediates so nothing earlier is dead code.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from curdleproofs_tpu.ops import msm_device as md
    from curdleproofs_tpu.ops.field import FQ
    from curdleproofs_tpu.ops.g1_ops import PointsXYZ, g1_infinity
    from curdleproofs_tpu.ops.msm_device import _BIG, _signed_digits, _take1

    n, c, t_rows, s_pad = params.n, params.c, params.t_rows, params.s_pad
    b_cnt = 1 << (c - 1)
    w_cnt = params.windows
    wb = w_cnt * b_cnt

    def run(ext_px, ext_py, ext_zb, limbs):
        digits = _signed_digits(limbs, n, c)
        if stage == "digits":
            return digits

        live = digits != 0
        key = jnp.where(live, jnp.abs(digits) - 1, b_cnt)
        idx = jnp.arange(n, dtype=jnp.int32)[None, :]
        eidx = jnp.where(digits < 0, idx + n, idx) + jnp.zeros_like(key)
        key_s, e_s = lax.sort((key, eidx), dimension=1, num_keys=1)
        if stage == "sort":
            return key_s, e_s

        live_s = key_s < b_cnt
        p = lax.broadcasted_iota(jnp.int32, (w_cnt, n), 1)
        bd = jnp.concatenate(
            [jnp.ones((w_cnt, 1), bool), key_s[:, 1:] != key_s[:, :-1]],
            axis=1)
        run_start = lax.cummax(jnp.where(bd, p, 0), axis=1)
        r_in_run = p - run_start
        newslot = live_s & (r_in_run % t_rows == 0)
        slot_in_w = jnp.cumsum(newslot.astype(jnp.int32), axis=1) - 1
        slots_per_w = slot_in_w[:, -1] + 1
        w_off = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(slots_per_w)[:-1]])
        gslot = jnp.where(live_s & (slot_in_w >= 0),
                          slot_in_w + w_off[:, None], -1)
        live_cell = live_s & (gslot >= 0)
        row = r_in_run % t_rows
        dest = jnp.where(live_cell, row * s_pad + gslot,
                         t_rows * s_pad).reshape(-1)
        plan = jnp.full((t_rows * s_pad,), 2 * n, jnp.int32).at[dest].set(
            e_s.reshape(-1), mode="drop").reshape(t_rows, s_pad)
        gkey = key_s + jnp.arange(w_cnt, dtype=jnp.int32)[:, None] * b_cnt
        sdest = jnp.where(live_cell, gslot, s_pad).reshape(-1)
        slot_gkey = jnp.full((s_pad,), wb + 9, jnp.int32).at[sdest].set(
            gkey.reshape(-1), mode="drop")
        kdest = jnp.where(live_cell, gkey, wb).reshape(-1)
        firstmap = jnp.full((wb,), _BIG, jnp.int32).at[kdest].min(
            gslot.reshape(-1), mode="drop")
        kmax = jnp.max(jnp.where(live_s, r_in_run // t_rows, 0)) + 1
        if stage == "plan":
            return plan, slot_gkey, firstmap, kmax

        gx = _take1(ext_px, plan)
        gy = _take1(ext_py, plan)
        gzb = jnp.take(ext_zb, plan.reshape(-1)).reshape(t_rows, s_pad)
        if stage == "gather":
            return gx, gy, gzb, slot_gkey, firstmap, kmax

        from curdleproofs_tpu.ops.pallas_kernels import (
            g1_fold_rows_madd_pallas, g1_fold_rows_packed_pallas,
        )
        fold = (g1_fold_rows_madd_pallas if madd
                else g1_fold_rows_packed_pallas)
        acc = PointsXYZ(*fold(gx, gy, gzb))
        if stage == "fold":
            return acc, slot_gkey, firstmap, kmax

        sidx = jnp.arange(s_pad, dtype=jnp.int32)

        def mbody(st):
            stride, ax, ay, az = st
            partner = jnp.minimum(sidx + stride, s_pad - 1)
            same = (jnp.take(slot_gkey, partner) == slot_gkey) \
                & (sidx + stride < s_pad)
            cur = PointsXYZ(ax, ay, az)
            q = PointsXYZ(jnp.take(ax, partner, axis=1),
                          jnp.take(ay, partner, axis=1),
                          jnp.take(az, partner, axis=1))
            s = md._dev_add(cur, q, pallas)
            return (stride * 2,
                    jnp.where(same[None], s.x, ax),
                    jnp.where(same[None], s.y, ay),
                    jnp.where(same[None], s.z, az))

        _, mx, my, mz = lax.while_loop(
            lambda st: st[0] < kmax, mbody, (jnp.int32(1), *acc))
        if stage == "merge":
            return mx, my, mz, firstmap
        raise ValueError(stage)

    return jax.jit(run)


def main() -> None:
    import random

    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    print(f"device init {time.perf_counter() - t0:.0f}s", flush=True)

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.ops import msm_device as md
    from curdleproofs_tpu.ops.g1_ops import use_pallas

    logns = [int(a) for a in sys.argv[1:]] or [16, 18, 20]
    rnd = random.Random(1)
    rng = StdRng.seed_from_u64(0)

    t0 = time.perf_counter()
    base_pts = [rng.rand_g1() for _ in range(1 << 14)]
    print(f"gen base points {time.perf_counter() - t0:.0f}s", flush=True)

    pallas, madd = use_pallas(), md.use_madd()
    results = {}
    stages = ["digits", "sort", "plan", "gather", "fold", "merge"]

    for logn in logns:
        n = 1 << logn
        tiles = -(-n // len(base_pts))
        pts = (base_pts * tiles)[:n]
        ss = [rnd.randrange(R) for _ in range(n)]
        params = md.pick_params(n)
        print(f"[{logn}] {params}", flush=True)
        bases = md.DeviceBases(pts, n_pad=params.n)
        limbs = jnp.asarray(md._scalars_to_limbs(ss, params.n))
        args = (bases.ext_px, bases.ext_py, bases.ext_zb, limbs)

        walls = {}
        for stage in stages:
            fn = build_prefix(stage, params, pallas, madd)
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            first = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(*args)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            walls[stage] = best * 1e3
            print(f"[{logn}] {stage:8s} cum {best*1e3:9.1f} ms "
                  f"(first {first:.1f}s)", flush=True)
            del out

        # full pipeline for the residual (phase-3 reduction + mont exit)
        t0 = time.perf_counter()
        out = md._dispatch_pipeline(bases, ss, params)
        jax.block_until_ready(out)
        first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = md._dispatch_pipeline(bases, ss, params)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        walls["full"] = best * 1e3
        print(f"[{logn}] {'full':8s} cum {best*1e3:9.1f} ms "
              f"(first {first:.1f}s)", flush=True)

        phases = {}
        prev = 0.0
        for stage in stages + ["full"]:
            phases[stage] = round(walls[stage] - prev, 1)
            prev = walls[stage]
        results[str(logn)] = {
            "c": params.c, "t_rows": params.t_rows, "s_pad": params.s_pad,
            "cumulative_ms": {k: round(v, 1) for k, v in walls.items()},
            "phase_ms": phases,
        }
        print(f"[{logn}] phases: {json.dumps(phases)}", flush=True)

    out_path = pathlib.Path(__file__).resolve().parents[1] / \
        "bench_msm_phases.json"
    out_path.write_text(json.dumps(results, indent=1) + "\n")
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
