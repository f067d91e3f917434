"""Measure true cold-start: fresh process -> first MSM result at one shape.

    CURDLEPROOFS_TPU_REAL=1 python scripts/cold_start_probe.py [logn]

Prints a JSON line with the phases a cold process actually pays:
device init, bases upload, first MSM wall (lowering+compile+run or
AOT-deserialize+cached-compile+run), and a second MSM for the warm marginal.
Run once with CURDLEPROOFS_AOT=0 and once with blobs present for the A/B.
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
    t_start = time.perf_counter()
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import random

    import jax
    import numpy as np

    bg = os.environ.get("CURDLEPROOFS_BG_INIT") == "1"
    if bg:
        # A/B (VERDICT r04 item 8): first device touch runs on a daemon
        # thread so the stall overlaps the host-side generation below
        from curdleproofs_tpu.ops.warmup import start_background_init

        start_background_init()
    jax.devices()
    t_init = time.perf_counter()

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.host import native
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.ops import aot
    from curdleproofs_tpu.ops.g1_ops import use_pallas
    from curdleproofs_tpu.ops.msm_device import (
        msm_device, pick_params, prepare_bases, use_madd,
    )

    n = 1 << logn
    rng = StdRng.seed_from_u64(7)
    rnd = random.Random(7)
    base = [rng.rand_g1() for _ in range(4096)]
    pts = [base[i % len(base)] for i in range(n)]
    ss = [rnd.randrange(R) for _ in range(n)]
    t_gen = time.perf_counter()
    # first device touch on its own clock: the tunnel's first operation of
    # a process can stall for minutes (platform weather, not our code)
    import jax.numpy as jnp

    if bg:
        from curdleproofs_tpu.ops.warmup import wait_ready

        bg_stats = wait_ready()
    else:
        bg_stats = None
    np.asarray(jnp.zeros((8,), jnp.uint32) + 1)
    t_touch = time.perf_counter()
    bases = prepare_bases(pts)
    np.asarray(bases.ext_zb)  # sync the upload
    t_up = time.perf_counter()

    aot_hit = aot.maybe_load(pick_params(n), use_pallas(), use_madd())
    got = msm_device(bases, ss)
    t_first = time.perf_counter()
    got2 = msm_device(bases, ss)
    t_second = time.perf_counter()

    ok = True
    if native.available():
        want = native.msm(pts, ss)
        ok = got.to_affine() == want.to_affine() == got2.to_affine()
    print(json.dumps({
        "logn": logn,
        "aot": bool(aot_hit),
        **({"bg_init": {k: round(v, 1) if isinstance(v, float) else v
                        for k, v in bg_stats.items()}} if bg_stats else {}),
        "init_s": round(t_init - t_start, 1),
        "host_gen_s": round(t_gen - t_init, 1),
        "first_device_touch_s": round(t_touch - t_gen, 1),
        "upload_s": round(t_up - t_touch, 1),
        "first_msm_s": round(t_first - t_up, 2),
        "second_msm_s": round(t_second - t_first, 2),
        "total_cold_s": round(t_first - t_start, 1),
        "match": ok,
    }), flush=True)


if __name__ == "__main__":
    main()
