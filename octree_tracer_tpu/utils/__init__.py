"""Utilities: timing/profiling instrumentation."""

from .timing import FrameTimer, timed, xla_trace

__all__ = ["FrameTimer", "timed", "xla_trace"]
