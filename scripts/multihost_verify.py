"""Two-process distributed batch verification over a real JAX process group.

Executes SURVEY.md §2c row 5 ("cross-host collectives backend") with a world
size > 1: the parent spawns two worker processes on this machine (CPU
platform), each joins the process group via `init_multihost` (localhost
coordinator -> `jax.distributed.initialize`), and each verifies its
`process_slice` of the same proof batch with `distributed_batch_verify`.
The verdict AND-reduces across hosts with `all_hosts_agree`
(`multihost_utils.process_allgather` — the one DCN collective this
placement needs; see parallel/distributed.py).

Two passes exercise the reduction both ways:
  pass "valid":   every proof good  -> local True/True   -> global True
  pass "corrupt": a proof in rank 1's slice is bad (T/U swapped)
                  -> local True(rank0)/False(rank1)      -> global False on BOTH

Run: python scripts/multihost_verify.py        (parent; writes
     bench_multihost.json and prints one JSON line)
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:  # the parent writes artifacts via the package
    sys.path.insert(0, str(REPO))
COORD = "localhost:17717"
WORLD = 2
# defaults stay small for the shared 1-core host; override for a heavier run
B = int(os.environ.get("MH_BATCH", "4"))       # proofs (B/WORLD per process)
ELL = int(os.environ.get("MH_ELL", "28"))


def build_batch():
    """Deterministic batch — every process derives the SAME proofs."""
    from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.parallel.batch_verify import ShuffleInstance
    from curdleproofs_tpu.util import shuffle_permute_and_commit_input

    rng = StdRng.seed_from_u64(3)
    crs = generate_crs(ELL)
    instances, proofs = [], []
    for _ in range(B):
        perm = list(range(ELL))
        rng.shuffle(perm)
        k = rng.rand_fr()
        vec_R = [rng.rand_g1() for _ in range(ELL)]
        vec_S = [rng.rand_g1() for _ in range(ELL)]
        vec_T, vec_U, M, mb = shuffle_permute_and_commit_input(
            crs, vec_R, vec_S, perm, k, rng)
        proofs.append(CurdleproofsProof.new(
            crs, vec_R, vec_S, vec_T, vec_U, M, perm, k, mb, rng))
        instances.append(ShuffleInstance(vec_R, vec_S, vec_T, vec_U, M))
    return crs, instances, proofs


def worker(rank: int) -> None:
    # join the process group BEFORE anything can touch the XLA backend
    # (importing the package resolves the default backend for env routing)
    import jax

    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=WORLD, process_id=rank)
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.parallel.distributed import (
        all_hosts_agree, distributed_batch_verify, init_multihost,
        process_slice)

    pid, world = init_multihost(COORD, WORLD, rank)  # idempotent re-entry

    assert (pid, world) == (rank, WORLD), (pid, world)
    crs, instances, proofs = build_batch()

    results = {"rank": pid, "process_count": world,
               "global_devices": len(jax.devices()),
               "slice": [process_slice(B).start, process_slice(B).stop]}

    ok_valid = distributed_batch_verify(
        crs, instances, proofs, StdRng.seed_from_u64(99))
    results["valid_pass"] = bool(ok_valid)

    # corrupt a proof in rank 1's slice (identically in every process —
    # the full batch must agree across hosts)
    bad = instances[B - 1]
    bad.vec_T, bad.vec_U = bad.vec_U, bad.vec_T
    local_ok = None
    sl = process_slice(B)
    from curdleproofs_tpu.parallel.batch_verify import batch_verify
    local_ok = bool(batch_verify(crs, instances[sl], proofs[sl],
                                 StdRng.seed_from_u64(99)))
    results["local_ok_corrupt"] = local_ok
    results["corrupt_pass"] = bool(all_hosts_agree(local_ok))
    print("WORKER " + json.dumps(results), flush=True)


def parent() -> int:
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO),
               CURDLEPROOFS_BACKEND="host")
    env.pop("CURDLEPROOFS_TPU_REAL", None)
    t0 = time.time()
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--rank", str(r)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(REPO)) for r in range(WORLD)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    wall = time.time() - t0
    workers = []
    for r, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith("WORKER ")]
        if not lines:
            print(f"rank {r} produced no result; output:\n{out}")
            return 1
        workers.append(json.loads(lines[-1][len("WORKER "):]))
    ok = (all(w["process_count"] == WORLD for w in workers)
          and all(w["valid_pass"] for w in workers)
          and not any(w["corrupt_pass"] for w in workers)
          and workers[0]["local_ok_corrupt"]          # rank 0 slice clean
          and not workers[1]["local_ok_corrupt"])     # rank 1 saw the bad one
    artifact = {"ok": ok, "world": WORLD, "batch": B, "ell": ELL,
                "wall_s": round(wall, 1), "workers": workers}
    # correctness smoke run: its OWN artifact — the config-5 scaling
    # measurement (bench_multihost.json, scripts/multihost_scaling.py) must
    # never be clobbered by a smoke-scale refresh (VERDICT r04 missing #1)
    from curdleproofs_tpu.utils.artifacts import write_artifact

    write_artifact(REPO / "bench_multihost_smoke.json", artifact)
    print(json.dumps(artifact))
    return 0 if ok else 1


if __name__ == "__main__":
    if "--rank" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--rank") + 1]))
    else:
        sys.exit(parent())
