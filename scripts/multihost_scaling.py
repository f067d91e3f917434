"""Multi-host batched-verification scaling at BASELINE config-5 scale:
B=1024 proofs, ell=252, world=2 (VERDICT r03 item 5; BASELINE.md >=90%
linear-scaling target).

    python scripts/multihost_scaling.py            # full measurement
    MH_B=64 MH_ELL=28 python scripts/multihost_scaling.py   # quick mode

Methodology — this machine has ONE CPU core (`nproc` = 1), so two live
localhost worker processes time-share the core and a concurrent wall
measures the OS scheduler, not the framework.  The artifact therefore
reports BOTH:

  efficiency_isolated    T_single / (world * max_h T_host[h]) where each
                         host's slice runs ALONE on the core — the number
                         that predicts real N-host hardware, since the
                         framework adds only one 4-byte DCN all-gather of
                         the verdict (measured separately, milliseconds)
  efficiency_concurrent  T_single / T_world2_wall with both workers live on
                         the 1 core (~0.5 by construction; recorded to show
                         the contention, labeled as hardware-bound)

Per-host timings split transcript replay (pure Python+native, perfectly
data-parallel) from the final deduped MSM (per-host Pippenger; slightly
sublinear in favor of bigger batches, the only real efficiency loss).

Every process derives the same batch deterministically (per-instance seeded
StdRng) and proofs are cached on disk after the first build, so repeated
runs skip the ~3 min prover pass.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
COORD = "localhost:17719"
WORLD = 2
B = int(os.environ.get("MH_B", "1024"))
ELL = int(os.environ.get("MH_ELL", "252"))
CACHE = pathlib.Path(f"/tmp/mh_proofs_ell{ELL}_B{B}.bin")


def build_batch():
    """Deterministic batch; proof BYTES cached on disk (instances are cheap
    to regenerate, proving is not).  Per-instance seeded RNGs make instance
    regeneration independent of whether proving ran."""
    from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.host.serde import deferred_subgroup_checks
    from curdleproofs_tpu.parallel.batch_verify import ShuffleInstance
    from curdleproofs_tpu.util import shuffle_permute_and_commit_input

    crs = generate_crs(ELL)
    base_rng = StdRng.seed_from_u64(3)
    vec_R = [base_rng.rand_g1() for _ in range(ELL)]
    vec_S = [base_rng.rand_g1() for _ in range(ELL)]

    proof_size = len_proof = None
    blobs = None
    if CACHE.is_file():
        raw = CACHE.read_bytes()
        n_each = len(raw) // B
        blobs = [raw[i * n_each : (i + 1) * n_each] for i in range(B)]

    instances, proofs = [], []
    for i in range(B):
        rng = StdRng.seed_from_u64(10_000 + i)
        perm = list(range(ELL))
        rng.shuffle(perm)
        k = rng.rand_fr()
        vec_T, vec_U, M, mb = shuffle_permute_and_commit_input(
            crs, vec_R, vec_S, perm, k, rng)
        instances.append(ShuffleInstance(vec_R, vec_S, vec_T, vec_U, M))
        if blobs is None:
            proofs.append(CurdleproofsProof.new(
                crs, vec_R, vec_S, vec_T, vec_U, M, perm, k, mb, rng))
        else:
            with deferred_subgroup_checks():
                proofs.append(CurdleproofsProof.deserialize(
                    blobs[i], crs.log2_n()))
    if blobs is None:
        raw = b"".join(p.serialize() for p in proofs)
        CACHE.write_bytes(raw)
    del proof_size, len_proof
    return crs, instances, proofs


def timed_verify(crs, instances, proofs, seed: int, repeats: int = 3) -> dict:
    """Replay + final-MSM split for one slice (host engine), min-of-N (the
    shared box's scheduler noise swings single runs ~20%)."""
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.msm_accumulator import MsmAccumulator
    from curdleproofs_tpu.util import msm

    best_replay = best_msm = float("inf")
    ok = False
    n_bases = 0
    for r in range(repeats):
        rng = StdRng.seed_from_u64(seed + r)
        acc = MsmAccumulator()
        t0 = time.perf_counter()
        for inst, pf in zip(instances, proofs):
            pf.verify_with_accumulator(crs, inst.vec_R, inst.vec_S,
                                       inst.vec_T, inst.vec_U, inst.M, acc,
                                       rng)
        best_replay = min(best_replay, time.perf_counter() - t0)
        bases, scalars = acc.dedup_raw()
        n_bases = len(bases)
        t0 = time.perf_counter()
        if isinstance(scalars, (bytes, bytearray)):
            from curdleproofs_tpu.backend import get_backend

            ok = get_backend().msm_raw(bases, scalars).is_infinity()
        else:
            ok = msm(bases, scalars).is_infinity()
        best_msm = min(best_msm, time.perf_counter() - t0)
    return {"ok": bool(ok), "n": len(proofs),
            "replay_s": round(best_replay, 2), "msm_s": round(best_msm, 2),
            "msm_bases": n_bases,
            "wall_s": round(best_replay + best_msm, 2)}


def run_slice(a: int, b: int) -> None:
    """Isolated measurement of one host's share (no process group)."""
    crs, instances, proofs = build_batch()
    out = timed_verify(crs, instances[a:b], proofs[a:b], seed=99)
    print("SLICE " + json.dumps(out), flush=True)


def run_scaling() -> None:
    """Single-host wall and both per-host-isolated walls, measured
    INTERLEAVED in one process: the box's scheduler/frequency noise swings
    successive runs ~30-40%, far more than the scaling loss being resolved,
    so the three measurements must share one noise regime.  Each stage's
    wall is min-of-3 round-robin passes; each still runs ALONE on the core
    (the distributed framework adds only the verdict all-gather, measured
    in the live world=2 run)."""
    crs, instances, proofs = build_batch()
    half = B // 2
    slices = {"single": (0, B), "h0": (0, half), "h1": (half, B)}
    runs = {k: [] for k in slices}
    for rep in range(5):
        for k, (a, b) in slices.items():
            runs[k].append(timed_verify(crs, instances[a:b], proofs[a:b],
                                        seed=99 + rep, repeats=1))
    best = {}
    for k, outs in runs.items():
        # noise-floor estimate: per-COMPONENT minima (a single rep's wall
        # couples the two phases to one scheduler epoch)
        replay = min(o["replay_s"] for o in outs)
        msm = min(o["msm_s"] for o in outs)
        best[k] = {
            "ok": all(o["ok"] for o in outs), "n": outs[0]["n"],
            "replay_s": replay, "msm_s": msm,
            "msm_bases": outs[0]["msm_bases"],
            "wall_s": round(replay + msm, 2),
            "wall_spread_s": [min(o["wall_s"] for o in outs),
                              max(o["wall_s"] for o in outs)],
        }
    print("SCALING " + json.dumps(best), flush=True)


def worker(rank: int) -> None:
    """Live world=2 process-group member."""
    import jax

    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=WORLD, process_id=rank)
    from curdleproofs_tpu.parallel.distributed import (
        all_hosts_agree, process_slice,
    )

    crs, instances, proofs = build_batch()
    sl = process_slice(B)
    t0 = time.perf_counter()
    out = timed_verify(crs, instances[sl], proofs[sl], seed=99, repeats=1)
    t1 = time.perf_counter()
    agreed = all_hosts_agree(out["ok"])
    t2 = time.perf_counter()
    agreed2 = all_hosts_agree(out["ok"])  # warm: first pays jit compile
    out.update(rank=rank, world=jax.process_count(),
               slice=[sl.start, sl.stop],
               allgather_first_ms=round((t2 - t1) * 1e3, 1),
               allgather_warm_ms=round((time.perf_counter() - t2) * 1e3, 1),
               wall_with_collective_s=round(t2 - t0, 2),
               global_ok=bool(agreed and agreed2))
    print("WORKER " + json.dumps(out), flush=True)


def _spawn(args: list[str], env_extra: dict | None = None):
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO),
               CURDLEPROOFS_BACKEND="host")
    env.pop("CURDLEPROOFS_TPU_REAL", None)
    env.update(env_extra or {})
    return subprocess.Popen([sys.executable, __file__, *args],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env,
                            cwd=str(REPO))


def _collect(proc, tag: str) -> dict:
    out = proc.communicate(timeout=7200)[0]
    lines = [ln for ln in out.splitlines() if ln.startswith(tag + " ")]
    if not lines:
        raise RuntimeError(f"no {tag} line; output:\n{out[-4000:]}")
    return json.loads(lines[-1][len(tag) + 1:])


def parent() -> int:
    t_start = time.time()

    # interleaved isolated runs, all in ONE process (shared noise regime)
    print(f"[1/2] scaling walls (interleaved, min-of-3) B={B}...",
          flush=True)
    walls = _collect(_spawn(["--scaling"]), "SCALING")
    single, h0, h1 = walls["single"], walls["h0"], walls["h1"]
    print(json.dumps(walls), flush=True)

    # live world=2 (contended on the 1-core host; exercises the real
    # process group + DCN all-gather)
    print("[2/2] live world=2 process group...", flush=True)
    t0 = time.time()
    procs = [_spawn(["--rank", str(r)]) for r in range(WORLD)]
    workers = [_collect(p, "WORKER") for p in procs]
    concurrent_wall = time.time() - t0

    ok = (single["ok"] and h0["ok"] and h1["ok"]
          and all(w["global_ok"] for w in workers)
          and all(w["world"] == WORLD for w in workers))
    t1 = single["wall_s"]
    t_iso = max(h0["wall_s"], h1["wall_s"])
    artifact = {
        "ok": ok,
        "world": WORLD, "batch": B, "ell": ELL,
        "single_host": single,
        "per_host_isolated": [h0, h1],
        "efficiency_isolated": round(t1 / (WORLD * t_iso), 3),
        "live_world2": {
            "workers": workers,
            "wall_s": round(concurrent_wall, 1),
            "efficiency_concurrent": round(t1 / concurrent_wall, 3),
        },
        "proofs_per_s_single": round(B / t1, 1),
        "proofs_per_s_scaled": round(B / t_iso, 1),
        "methodology": (
            "1-core host: single-host and per-host walls measured "
            "interleaved in one process (min-of-3 round-robin; the box's "
            "scheduler noise swings runs ~30-40%, so the ratios need one "
            "shared noise regime), each run alone on the core; the "
            "framework's only cross-host step is the 4-byte verdict "
            "all-gather, measured live in the world=2 run; the concurrent "
            "efficiency is core-contention-bound, not framework-bound"),
        "target": ">=0.90 linear scaling (BASELINE.md config 5)",
        "total_harness_s": round(time.time() - t_start, 1),
    }
    from curdleproofs_tpu.utils.artifacts import write_artifact

    # refuses to replace a larger measurement with a smaller one (the r04
    # B=4/ell=28 smoke clobber); MH_B/MH_ELL quick modes must set
    # CURDLEPROOFS_ARTIFACT_DOWNGRADE=1 to land at all
    write_artifact(REPO / "bench_multihost.json", artifact)
    print(json.dumps(artifact))
    return 0 if ok else 1


if __name__ == "__main__":
    if "--rank" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--rank") + 1]))
    elif "--scaling" in sys.argv:
        run_scaling()
    elif "--slice" in sys.argv:
        i = sys.argv.index("--slice")
        run_slice(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    else:
        sys.exit(parent())
