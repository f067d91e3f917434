"""Precompile the standard device-MSM shape families into the persistent
JAX compilation cache, so production processes start warm.

    CURDLEPROOFS_TPU_REAL=1 python scripts/warm_cache.py [logns...]

A cold process pays (a) jaxpr->MLIR lowering (per process, unavoidable,
seconds with the unrolled row formulation) and (b) XLA/Mosaic compilation
(minutes per family — skipped on a persistent-cache hit).  This script pays
(b) once for the families named (default: the bench/protocol set).
"""

import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/curdleproofs_jax_cache")
os.environ.setdefault("CURDLEPROOFS_TPU_REAL", "1")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    import random

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.ops.msm_device import msm_device, prepare_bases

    logns = [int(a) for a in sys.argv[1:]] or [14, 16, 18, 20]
    rng = StdRng.seed_from_u64(7)
    rnd = random.Random(7)
    base = [rng.rand_g1() for _ in range(4096)]
    for logn in logns:
        n = 1 << logn
        pts = [base[i % len(base)] for i in range(n)]
        ss = [rnd.randrange(R) for _ in range(n)]
        t0 = time.perf_counter()
        msm_device(prepare_bases(pts), ss)
        print(f"2^{logn}: warm in {time.perf_counter() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
