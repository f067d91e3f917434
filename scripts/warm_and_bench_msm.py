"""Warm the compile cache and benchmark the device MSM at sweep sizes
(BASELINE.json config 3; fixed-shape pallas bucket fold, ops/msm_device.py).

Writes one JSON line per size to bench_msm_results.jsonl (append).
Run: nohup python scripts/warm_and_bench_msm.py 12 14 16 &
"""
import json
import os
import pathlib
import sys
import time

os.environ.setdefault("CURDLEPROOFS_TPU_REAL", "1")
os.environ.setdefault("CURDLEPROOFS_USE_PALLAS", "1")
sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/curdleproofs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

from curdleproofs_tpu.backend import HostBackend
from curdleproofs_tpu.constants import R
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ops.msm_device import msm_device, pick_window_device

OUT = pathlib.Path(__file__).parents[1] / "bench_msm_results.jsonl"

rng = StdRng.seed_from_u64(4)
rnd = random.Random(3)
base = [rng.rand_g1() for _ in range(128)]
hb = HostBackend()

for logn in [int(a) for a in sys.argv[1:]] or [12]:
    n = 1 << logn
    pts = [base[i % 128] for i in range(n)]
    ss = [rnd.randrange(R) for _ in range(n)]
    t0 = time.time()
    r1 = msm_device(pts, ss)
    t_first = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        r2 = msm_device(pts, ss)
        times.append(time.time() - t0)
    # window autotune: probe the heuristic's neighbours, keep the best
    c0 = pick_window_device(n)
    best_c, best_t = c0, min(times)
    for c_try in (c0 - 1, c0 + 1):
        if c_try < 6 or c_try > 16:
            continue
        msm_device(pts, ss, c=c_try)  # compile/warm
        t0 = time.time()
        r_c = msm_device(pts, ss, c=c_try)
        dt = time.time() - t0
        assert r_c == r1
        if dt < best_t:
            best_c, best_t = c_try, dt
    t0 = time.time()
    r3 = hb.msm(pts, ss)
    t_host = time.time() - t0
    rec = {
        "log_n": logn, "c": pick_window_device(n),
        "autotuned_c": best_c, "autotuned_ms": round(best_t * 1e3, 1),
        "tpu_first_s": round(t_first, 1),
        "tpu_warm_ms": round(min(times) * 1e3, 1),
        "tpu_muls_per_s": round(n / min(times), 1),
        "host_ms": round(t_host * 1e3, 1),
        "match": bool(r1 == r3 and r2 == r3),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)
