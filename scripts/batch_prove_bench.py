"""Batched-prover benchmark: B lockstep proofs on the device vs B sequential
host proves (VERDICT r04 next-round item 1).

The single-proof offload is sync-floor-bound (docs/prover_offload.md); this
measures the amortized regime: `batch_prove` runs every folding round of the
whole batch as ONE grouped device dispatch (~19 dispatches total regardless
of B).  Writes bench_batch_prove.json.

Run:  CURDLEPROOFS_TPU_REAL=1 python scripts/batch_prove_bench.py [B] [ell]
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


def make_instances(crs, ell: int, count: int):
    """Bench inputs: one shared (R, S) tracker set (the whisk shuffle-relay
    shape), per-proof permutation/randomizer/blinders from per-proof RNGs."""
    from curdleproofs_tpu.host import native
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.parallel.batch_prove import ProveInstance
    from curdleproofs_tpu.util import get_permutation, msm

    base_rng = StdRng.seed_from_u64(42)
    vec_R = [base_rng.rand_g1() for _ in range(ell)]
    vec_S = [base_rng.rand_g1() for _ in range(ell)]
    out = []
    for i in range(count):
        rng = StdRng.seed_from_u64(1000 + i)
        perm = list(range(ell))
        rng.shuffle(perm)
        k = rng.rand_fr()
        vec_T = get_permutation(native.batch_mul(vec_R, k), perm)
        vec_U = get_permutation(native.batch_mul(vec_S, k), perm)
        vec_m_blinders = [rng.rand_fr() for _ in range(4)]
        M = msm(list(crs.vec_G) + list(crs.vec_H),
                list(perm) + vec_m_blinders)
        out.append(ProveInstance(vec_R, vec_S, vec_T, vec_U, M, perm, k,
                                 vec_m_blinders, rng))
    return out


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ell = int(sys.argv[2]) if len(sys.argv) > 2 else 252
    t_start = time.time()

    from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.parallel.batch_prove import batch_prove

    crs = generate_crs(ell)
    print(f"generating {B} instances at ell={ell} ...", flush=True)
    insts = make_instances(crs, ell, B)
    gen_s = time.time() - t_start

    # --- host baseline: sequential native prove ----------------------------
    n_host = min(8, B)
    t0 = time.time()
    host_proofs = []
    for inst in insts[:n_host]:
        # the instance's rng was advanced by the generator exactly as
        # batch_prove will see it, so the sequential twin gets identical
        # draw positions — rebuild the instance for an apples-to-apples rng
        host_proofs.append(CurdleproofsProof.new(
            crs, inst.vec_R, inst.vec_S, inst.vec_T, inst.vec_U, inst.M,
            inst.permutation, inst.k, inst.vec_m_blinders, inst.rng))
    host_ms = (time.time() - t0) / n_host * 1000
    print(f"host prove: {host_ms:.1f} ms/proof", flush=True)

    # --- batched device prove: cold then warm ------------------------------
    t0 = time.time()
    proofs_cold = batch_prove(crs, make_instances(crs, ell, B))
    cold_s = time.time() - t0
    print(f"batch_prove cold: {cold_s:.1f} s "
          f"({B / cold_s:.1f} proofs/s)", flush=True)

    insts2 = make_instances(crs, ell, B)
    t0 = time.time()
    proofs = batch_prove(crs, insts2)
    warm_s = time.time() - t0
    timings = {k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in getattr(batch_prove, "last_timings", {}).items()}
    print(f"batch_prove warm: {warm_s:.1f} s "
          f"({B / warm_s:.1f} proofs/s)  phases={timings}", flush=True)

    # --- correctness gates --------------------------------------------------
    assert proofs[0].serialize() == host_proofs[0].serialize(), \
        "batched proof bytes diverge from sequential"
    vrng = StdRng.seed_from_u64(7)
    proofs[-1].verify(crs, insts2[-1].vec_R, insts2[-1].vec_S,
                      insts2[-1].vec_T, insts2[-1].vec_U, insts2[-1].M, vrng)
    print("gates: bytes == sequential; last proof verifies", flush=True)

    host_batch_s = host_ms * B / 1000
    art = {
        "bench": "batch_prove",
        "B": B, "ell": ell,
        "host_ms_per_proof": round(host_ms, 2),
        "host_batch_s": round(host_batch_s, 2),
        "cold_s": round(cold_s, 2),
        "warm_s": round(warm_s, 2),
        "proofs_per_s_warm": round(B / warm_s, 2),
        "proofs_per_s_host": round(1000 / host_ms, 2),
        "speedup_vs_host": round(host_batch_s / warm_s, 3),
        "gen_s": round(gen_s, 1),
        "warm_phases": timings,
        "gates": {"bytes_match_sequential": True, "verify_ok": True},
    }
    from curdleproofs_tpu.utils.artifacts import write_artifact

    write_artifact(REPO / "bench_batch_prove.json", art)
    print(json.dumps(art))
    return 0


if __name__ == "__main__":
    sys.exit(main())
