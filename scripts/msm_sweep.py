"""Device-MSM sweep (BASELINE config 3: 2^10..2^20) + shard-proxy timings.

Run on real TPU:  CURDLEPROOFS_TPU_REAL=1 python scripts/msm_sweep.py [logns...]

Writes one JSON line per size to bench_msm_results.jsonl (appends), with the
autotuned (c, T, S) shape family, first-compile and warm times, the host C++
reference time, and a match check.  Also times the per-device program a
D-way point-sharded MSM would run (the same pipeline at n/D points — window
sums are additive so that IS the per-device work), which docs/scaling_report.md
turns into measured scaling numbers for the mesh the driver validates.

Base points: 2^16 fresh points, tiled above that (duplicate bases are valid
MSM inputs and keep generation off the 1-core host's critical path).
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


def main() -> None:
    import random

    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    print(f"device init {time.perf_counter() - t0:.0f}s", flush=True)

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.host import native
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.ops import msm_device as md

    logns = [int(a) for a in sys.argv[1:]] or [14, 16, 18, 20]
    rnd = random.Random(1)
    rng = StdRng.seed_from_u64(0)

    t0 = time.perf_counter()
    base_n = 1 << 16
    base_pts = [rng.rand_g1() for _ in range(min(base_n, 1 << max(logns)))]
    print(f"gen base points {time.perf_counter() - t0:.0f}s", flush=True)

    out_path = pathlib.Path(__file__).resolve().parents[1] / \
        "bench_msm_results.jsonl"

    for logn in logns:
        n = 1 << logn
        tiles = -(-n // len(base_pts))
        pts = (base_pts * tiles)[:n]
        ss = [rnd.randrange(R) for _ in range(n)]
        params = md.pick_params(n)
        print(f"[{logn}] {params}", flush=True)

        t0 = time.perf_counter()
        bases = md.prepare_bases(pts)
        prep_s = time.perf_counter() - t0
        print(f"[{logn}] prepare_bases {prep_s:.1f}s", flush=True)

        t0 = time.perf_counter()
        r1 = md.msm_device(bases, ss)
        first_s = time.perf_counter() - t0
        print(f"[{logn}] first {first_s:.1f}s", flush=True)
        warm = []
        for _ in range(3):
            t0 = time.perf_counter()
            r2 = md.msm_device(bases, ss)
            warm.append(time.perf_counter() - t0)
        warm_ms = min(warm) * 1e3
        print(f"[{logn}] warm {warm_ms:.1f} ms", flush=True)

        reps = 2 if logn <= 16 else 1
        host_ms = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            href = native.msm(pts, ss)
            host_ms = min(host_ms, (time.perf_counter() - t0) * 1e3)
        ok = r2.to_affine() == href.to_affine()
        row = {
            "log_n": logn, "c": params.c, "t_rows": params.t_rows,
            "s_pad": params.s_pad, "tpu_first_s": round(first_s, 1),
            "tpu_warm_ms": round(warm_ms, 1),
            "tpu_muls_per_s": round(n / (warm_ms / 1e3), 1),
            "host_ms": round(host_ms, 1),
            "prepare_bases_s": round(prep_s, 1),
            "speedup_vs_host": round(host_ms / warm_ms, 2),
            "match": bool(ok),
        }
        print(json.dumps(row), flush=True)
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")

    # shard-proxy: per-device wall time of a D-way point-sharded 2^16 MSM is
    # the same pipeline at 2^16/D points (window sums add across shards; the
    # host combine is D*W point additions, timed separately by the report).
    shard = {}
    n = 1 << 16
    ss = [rnd.randrange(R) for _ in range(n)]
    for d in (1, 2, 4, 8):
        nn = n // d
        tiles = -(-nn // len(base_pts))
        pts = (base_pts * tiles)[:nn]
        sub = ss[:nn]
        bases = md.prepare_bases(pts)
        md.msm_device(bases, sub)  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            md.msm_device(bases, sub)
            times.append(time.perf_counter() - t0)
        shard[d] = round(min(times) * 1e3, 1)
        print(f"shard-proxy D={d}: {shard[d]} ms", flush=True)
    spath = pathlib.Path(__file__).resolve().parents[1] / \
        "bench_shard_timings.json"
    spath.write_text(json.dumps(
        {"n": n, "per_device_ms_at_n_over_D": shard}, indent=1))
    print("wrote", spath, flush=True)


if __name__ == "__main__":
    main()
