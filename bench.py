"""Benchmark harness. Prints ONE JSON line with the headline metric.

Headline: ell=252 shuffle-proof prover wall time vs the reference's published
560 ms (Intel i7-8550U, /root/reference/README.md:49; see BASELINE.md).
Sub-metrics (verify, shuffle, MSM throughput) ride in "extra".

Run on real hardware:  python bench.py           (uses the default backend)
Quick mode:            python bench.py --ell 60
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("CURDLEPROOFS_TPU_REAL", "1")


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/curdleproofs_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

BASELINES_MS = {  # README.md:47-49 (prove, verify, shuffle)
    60: (177.0, 22.0, 28.0),
    124: (304.0, 27.0, 57.0),
    252: (560.0, 35.0, 121.0),
}


def bench_protocol(ell: int, repeats: int = 3):
    from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.util import (
        generate_blinders, get_permutation, msm,
    )
    from curdleproofs_tpu.backend import get_backend

    rng = StdRng.seed_from_u64(0)
    crs = generate_crs(ell)

    permutation = list(range(ell))
    rng.shuffle(permutation)
    k = rng.rand_fr()
    vec_r_m = generate_blinders(rng, 4)
    vec_R = [rng.rand_g1() for _ in range(ell)]
    vec_S = [rng.rand_g1() for _ in range(ell)]

    backend = get_backend()

    # --- shuffling (2*ell scalar muls + permute), as in benches/perf.rs:51-58
    t_sh = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        vec_T = get_permutation(backend.batch_mul(vec_R, k), permutation)
        vec_U = get_permutation(backend.batch_mul(vec_S, k), permutation)
        t_sh.append(time.perf_counter() - t0)

    sigma = get_permutation(list(range(ell)), permutation)
    M = msm(crs.vec_G, sigma).add(msm(crs.vec_H, vec_r_m))

    # --- prover
    t_pr = []
    proof = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        proof = CurdleproofsProof.new(crs, vec_R, vec_S, vec_T, vec_U, M,
                                      permutation, k, vec_r_m, rng)
        t_pr.append(time.perf_counter() - t0)

    # --- verifier (pure verify on parsed objects, as in benches/perf.rs:99-105)
    t_vf = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        proof.verify(crs, vec_R, vec_S, vec_T, vec_U, M, rng)
        t_vf.append(time.perf_counter() - t0)

    # --- batched verification (BASELINE config 5, single-host figure):
    # distinct proofs over the same inputs; CRS + (R, S) bases dedup into
    # ONE accumulated MSM for the whole batch
    from curdleproofs_tpu.parallel.batch_verify import (
        ShuffleInstance, batch_verify,
    )

    B = 8
    instances, proofs = [], []
    for _ in range(B):
        p_i = list(range(ell))
        rng.shuffle(p_i)
        k_i = rng.rand_fr()
        t_i = get_permutation(backend.batch_mul(vec_R, k_i), p_i)
        u_i = get_permutation(backend.batch_mul(vec_S, k_i), p_i)
        sigma_i = get_permutation(list(range(ell)), p_i)
        rb_i = generate_blinders(rng, 4)
        m_i = msm(crs.vec_G, sigma_i).add(msm(crs.vec_H, rb_i))
        instances.append(ShuffleInstance(vec_R, vec_S, t_i, u_i, m_i))
        proofs.append(CurdleproofsProof.new(crs, vec_R, vec_S, t_i, u_i, m_i,
                                            p_i, k_i, rb_i, rng))
    assert batch_verify(crs, instances, proofs, rng)  # warm
    t_batch = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        assert batch_verify(crs, instances, proofs, rng)
        t_batch = min(t_batch, time.perf_counter() - t0)

    return (min(t_sh) * 1e3, min(t_pr) * 1e3, min(t_vf) * 1e3,
            B / t_batch)


def bench_msm_throughput(log_n: int = 12):
    """Device MSM scalar-muls/sec/chip at 2^log_n points (fixed-shape
    pallas bucket fold, ops/msm_device.py)."""
    _enable_compile_cache()
    import os

    os.environ.setdefault("CURDLEPROOFS_USE_PALLAS", "1")
    import random

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.ops.msm_device import msm_device

    n = 1 << log_n
    rng = StdRng.seed_from_u64(1)
    rnd = random.Random(1)
    base = [rng.rand_g1() for _ in range(64)]
    pts = [base[i % 64] for i in range(n)]
    ss = [rnd.randrange(R) for _ in range(n)]

    msm_device(pts, ss)  # compile + warm
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        msm_device(pts, ss)
    dt = (time.perf_counter() - t0) / reps
    return n / dt  # scalar-muls per second (end-to-end incl. host plan)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ell", type=int, default=252)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--msm-logn", type=int, default=12)
    ap.add_argument("--skip-msm", action="store_true")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the device MSM")
    args = ap.parse_args()

    shuffle_ms, prove_ms, verify_ms, batch_rate = bench_protocol(
        args.ell, args.repeats)
    base_prove, base_verify, base_shuffle = BASELINES_MS.get(
        args.ell, BASELINES_MS[252])

    extra = {
        "ell": args.ell,
        "verify_ms": round(verify_ms, 2),
        "verify_vs_baseline": round(base_verify / verify_ms, 3),
        "shuffle_ms": round(shuffle_ms, 2),
        "shuffle_vs_baseline": round(base_shuffle / shuffle_ms, 3),
        "batch_verify_proofs_per_s": round(batch_rate, 2),
        "baseline_hw": "i7-8550U (reference README)",
    }
    if not args.skip_msm:
        try:
            if args.profile:
                import jax

                with jax.profiler.trace(args.profile):
                    msm_rate = bench_msm_throughput(args.msm_logn)
            else:
                msm_rate = bench_msm_throughput(args.msm_logn)
            extra["device_msm_scalar_muls_per_s"] = round(msm_rate, 1)
            extra["device_msm_log_n"] = args.msm_logn
        except Exception as e:  # no TPU available etc.
            extra["device_msm_error"] = repr(e)[:200]

    print(json.dumps({
        "metric": f"prove_ell{args.ell}_ms",
        "value": round(prove_ms, 2),
        "unit": "ms",
        "vs_baseline": round(base_prove / prove_ms, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
