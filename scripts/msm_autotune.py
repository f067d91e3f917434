"""Measure device-MSM parameters per shape family and persist the winners.

    CURDLEPROOFS_TPU_REAL=1 python scripts/msm_autotune.py [logns...]

For each family (default 2^10..2^20 even octaves):
  - device warm wall per candidate window width (c=8 always; c=16 only
    where it can plausibly win, n >= 2^16 — below that its 32k-bucket
    slot floor dominates),
  - fresh-base preparation wall (native Montgomery export + upload + the
    on-device sqrt ingest) — what a non-resident MSM pays before digit 1,
  - the host C++ Pippenger wall on the same inputs,
then records {c, device_warm_ms, fresh_prep_ms, host_ms} to
`curdleproofs_tpu/ops/msm_tune.json` (committed), which `pick_params` and
`HybridBackend._route_to_device` consult (see ops/msm_tune.py).

Correctness is asserted against the host result at every family/width.
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
    import random

    import numpy as np

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.host import native
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.ops.msm_device import (
        DeviceBases, msm_device, pick_params,
    )
    from curdleproofs_tpu.ops.msm_tune import record_entry, table_path

    logns = [int(a) for a in sys.argv[1:]] or [10, 12, 14, 16, 18, 20]
    rng = StdRng.seed_from_u64(11)
    rnd = random.Random(11)
    pool = [rng.rand_g1() for _ in range(4096)]

    for logn in logns:
        n = 1 << logn
        pts = [pool[i % len(pool)] for i in range(n)]
        ss = [rnd.randrange(R) for _ in range(n)]

        t0 = time.perf_counter()
        want = native.msm(pts, ss)
        t1 = time.perf_counter()
        native.msm(pts, ss)
        host_ms = min(t1 - t0, time.perf_counter() - t1) * 1e3

        # fresh-base prep: export + upload + sqrt ingest, synced.  WARM
        # number (second construction, BOTH synced): the first pays the
        # ingest-jit lowering+compile and any early-process tunnel stall —
        # without its own sync those drain inside the second, timed,
        # construction (the r04 2^10 row measured a 985 s 'prep' that was
        # really the unsynced warm-up's backlog).
        warm0 = DeviceBases(pts)
        np.asarray(warm0.ext_zb[:1])
        t0 = time.perf_counter()
        bases = DeviceBases(pts)
        t_host = time.perf_counter()   # construction returns after dispatch:
        np.asarray(bases.ext_zb[:1])   # everything past here runs on device
        t_sync = time.perf_counter()
        fresh_prep_ms = (t_sync - t0) * 1e3
        # the HOST-BLOCKING share (native export + array staging): what a
        # pipelined consumer (DeviceMsmStream) actually pays per chunk —
        # the upload+ingest drain on the device in the shadow of later work
        fresh_prep_host_ms = (t_host - t0) * 1e3

        # steady-state feed: 4 back-to-back fresh uploads, one sync — the
        # device-side upload+ingest time per chunk a STREAM actually sees
        # (T4 = p_host + 4*I when device-bound, so I = (T4 - p_host)/4)
        t0 = time.perf_counter()
        feed = [DeviceBases(pts) for _ in range(4)]
        for fb in feed:
            np.asarray(fb.ext_zb[:1])
        t4_ms = (time.perf_counter() - t0) * 1e3
        ingest_dev_ms = max(0.0, t4_ms - fresh_prep_host_ms) / 4

        cands = [8] if n < (1 << 16) else [8, 16]
        results = {}
        for c in cands:
            params = pick_params(n, c)
            t0 = time.perf_counter()
            got = msm_device(bases, ss, c=c)
            first_s = time.perf_counter() - t0
            assert got.to_affine() == want.to_affine(), (logn, c)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                msm_device(bases, ss, c=c)
                best = min(best, time.perf_counter() - t0)
            results[c] = (best * 1e3, params, first_s)
            print(f"2^{logn} c={c}: warm {best * 1e3:.1f} ms "
                  f"(first {first_s:.1f} s, t={params.t_rows}, "
                  f"s_pad={params.s_pad})", flush=True)

        c_win = min(results, key=lambda c: results[c][0])
        warm_ms, params, _ = results[c_win]
        entry = {
            "c": c_win,
            "t_rows": params.t_rows,
            "s_pad": params.s_pad,
            "device_warm_ms": round(warm_ms, 1),
            "fresh_prep_ms": round(fresh_prep_ms, 1),
            "fresh_prep_host_ms": round(fresh_prep_host_ms, 1),
            "ingest_dev_ms": round(ingest_dev_ms, 1),
            "host_ms": round(host_ms, 1),
            "losers": {str(c): round(results[c][0], 1)
                       for c in results if c != c_win},
        }
        force = os.environ.get("CURDLEPROOFS_TUNE_FORCE") == "1"
        status = record_entry(params.n, entry, force=force)
        print(f"2^{logn} -> n_pad={params.n} [{status}]: {json.dumps(entry)}",
              flush=True)

    print(f"table written: {table_path()}")


if __name__ == "__main__":
    main()
