"""Measure whether the single-proof prover can profit from the TPU on this
link (VERDICT r03 item 6) — and record the arithmetic when it cannot.

The prover's hot structure is log2(n) folding rounds in the IPA plus
log2(n) in the sameMsm argument (/root/reference/src/inner_product_argument.rs:150-186,
same_multiscalar_argument.rs:99-136).  Each round's L/R points must come
back to the HOST to be hashed into the Fiat-Shamir transcript before the
next round's challenge exists, so device offload costs at least
(serial challenge round-trips) x (dispatch+readback sync floor), no matter
how fast the kernels are.

    CURDLEPROOFS_TPU_REAL=1 python scripts/sync_floor_probe.py

Writes one JSON line (bench_sync_floor.json in the round chain): the
measured sync floor, the implied prover floor at ell=252, the measured
host prove wall, and the verdict.
"""

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/curdleproofs_jax_cache")
os.environ.setdefault("CURDLEPROOFS_TPU_REAL", "1")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    # --- 1. dispatch+readback sync floor (median of 10)
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.uint32)
    np.asarray(f(x))  # compile
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    sync_ms = ts[5] * 1e3

    # --- 2. host prove wall at ell=252 (median of 3, 1 warm-up)
    from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.util import (
        generate_blinders, get_permutation, shuffle_permute_and_commit_input,
    )

    ell = 252
    rng = StdRng.seed_from_u64(0)
    crs = generate_crs(ell)
    perm = list(range(ell))
    rng.shuffle(perm)
    k = rng.rand_fr()
    vec_R = [rng.rand_g1() for _ in range(ell)]
    vec_S = [rng.rand_g1() for _ in range(ell)]
    T, U, M, mb = shuffle_permute_and_commit_input(crs, vec_R, vec_S, perm,
                                                   k, rng)
    walls = []
    for i in range(4):
        t0 = time.perf_counter()
        CurdleproofsProof.new(crs, vec_R, vec_S, T, U, M, perm, k, mb, rng)
        walls.append(time.perf_counter() - t0)
    prove_ms = sorted(walls[1:])[1] * 1e3

    # --- 3. the floor arithmetic
    # n = ell + N_BLINDERS = 256 -> log2_n = 8 serial challenge rounds in
    # the IPA and 8 in sameMsm; +3 for steps 1-3 commitments (A, cm_T/U,
    # B_a/B_t/B_u) if those MSMs also ran on device.
    log2n = crs.log2_n()
    serial_syncs = 2 * log2n + 3
    floor_ms = serial_syncs * sync_ms
    verdict = ("device offload impossible: the challenge-serial sync floor "
               "alone exceeds the whole host prove wall"
               if floor_ms > prove_ms else
               "device offload plausible within the sync budget")

    out = {
        "sync_floor_ms": round(sync_ms, 1),
        "sync_floor_spread_ms": [round(ts[0] * 1e3, 1),
                                 round(ts[-1] * 1e3, 1)],
        "ell": ell,
        "serial_challenge_syncs": serial_syncs,
        "prover_device_floor_ms": round(floor_ms, 1),
        "host_prove_ms": round(prove_ms, 1),
        "floor_over_host": round(floor_ms / prove_ms, 2),
        "verdict": verdict,
        "detail": (f"2*log2_n={2 * log2n} folding-round challenges + 3 "
                   "commitment syncs; each costs one device round-trip "
                   "because the Fiat-Shamir transcript (host) must absorb "
                   "L/R before the next challenge exists"),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
