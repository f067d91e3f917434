"""Misc utilities: tracing/profiling instrumentation."""

from .trace import span, trace_enabled  # noqa: F401
