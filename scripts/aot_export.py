"""Export AOT pipeline artifacts for the standard MSM shape families, so
cold processes skip BOTH lowering and compilation (see ops/aot.py).

    CURDLEPROOFS_TPU_REAL=1 python scripts/aot_export.py [logns...]

Default families: the protocol/bench set (2^14..2^20 at their default
window widths, plus the batch-verify stream chunk).  Each export pays the
full lowering+compile once; cold-start is then bounded by deserialize +
persistent-cache load (measure with scripts/cold_start_probe.py).
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
    from curdleproofs_tpu.ops import aot
    from curdleproofs_tpu.ops.g1_ops import use_pallas
    from curdleproofs_tpu.ops.msm_device import pick_params, use_madd

    logns = [int(a) for a in sys.argv[1:]] or [14, 16, 18, 20]
    pallas, madd = use_pallas(), use_madd()
    for logn in logns:
        params = pick_params(1 << logn)
        have_exec = (
            aot._load_exec(aot._blob_path(params, pallas, madd)) is not None
            and aot._load_exec(aot._ingest_blob_path(params.n, pallas))
            is not None)
        if have_exec and "--force" not in sys.argv:
            print(f"2^{logn} ({params}): blobs+exec current, skipped",
                  flush=True)
            continue
        t0 = time.perf_counter()
        aot.export_family(params, pallas, madd)
        aot.export_ingest(params.n, pallas)
        print(f"2^{logn} ({params}) in {time.perf_counter() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
