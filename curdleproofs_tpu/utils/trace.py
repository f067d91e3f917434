"""Lightweight phase tracing (the reference's `print-trace` feature analog,
`/root/reference/Cargo.toml:36`).

Enable with CURDLEPROOFS_TRACE=1: nested spans print indented wall times.
For device-side profiling use `jax.profiler.trace` around the workload and
inspect with TensorBoard/xprof; this module only times host-visible phases.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

_DEPTH = 0


def trace_enabled() -> bool:
    return os.environ.get("CURDLEPROOFS_TRACE") == "1"


@contextlib.contextmanager
def span(name: str):
    """Time a phase; prints 'name: X ms' (indented by nesting) when enabled."""
    global _DEPTH
    if not trace_enabled():
        yield
        return
    _DEPTH += 1
    depth = _DEPTH
    t0 = time.perf_counter()
    print(f"{'  ' * (depth - 1)}[trace] start {name}", file=sys.stderr)
    try:
        yield
    finally:
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{'  ' * (depth - 1)}[trace] end   {name}: {dt:.2f} ms",
              file=sys.stderr)
        _DEPTH -= 1
