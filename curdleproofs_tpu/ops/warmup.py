"""Background device warm-up: overlap platform init with host-side work.

A cold process pays a serial chain before its first device result:
platform/tunnel init (tens of seconds on the remote-TPU link), AOT blob
deserialize, bases upload, first pipeline execution.  Everything before the
upload needs NO protocol data, so a process that knows it will touch the
device can start init on a daemon thread at import time and spend the wait
on host work (CRS load/generation, witness prep, native base export).

`start_background_init()` is idempotent and cheap to call early;
`wait_ready()` joins it (returns the init wall).  bench.py and the
cold-start probe A/B it via CURDLEPROOFS_BG_INIT=1.
"""

from __future__ import annotations

import threading
import time

__all__ = ["start_background_init", "wait_ready"]

_lock = threading.Lock()
_thread: threading.Thread | None = None
_result: dict = {}


def _init_worker(load_aot_families: bool) -> None:
    t0 = time.perf_counter()
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        jax.devices()  # registers the platform (fast)
        # the real stall is the FIRST COMPUTATION through the link (r04
        # cold probe: 73.6 s at first touch vs 0.1 s for jax.devices());
        # run a trivial one here so the wait overlaps caller host work
        np.asarray(jnp.zeros((8,), jnp.uint32) + 1)
        _result["init_s"] = time.perf_counter() - t0
        if load_aot_families:
            # deserialize the AOT pipeline blobs for the stream family (the
            # batch-verify path) while the line is otherwise idle
            from . import aot
            from .g1_ops import use_pallas
            from .msm_device import stream_params, use_madd

            aot.maybe_load(stream_params(), use_pallas(), use_madd())
        _result["total_s"] = time.perf_counter() - t0
    except Exception as e:  # no device: callers fall back as usual
        _result["error"] = repr(e)[:200]


def start_background_init(load_aot_families: bool = True) -> None:
    """Begin device init on a daemon thread (idempotent)."""
    global _thread
    with _lock:
        if _thread is None:
            _thread = threading.Thread(
                target=_init_worker, args=(load_aot_families,), daemon=True)
            _thread.start()


def wait_ready(timeout: float | None = None) -> dict:
    """Join the background init; returns its timing/err dict."""
    t = _thread
    if t is not None:
        t.join(timeout)
    return dict(_result)
