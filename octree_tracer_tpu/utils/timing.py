"""Performance instrumentation: frame timer + JAX profiler hooks.

The reference's only instruments are an FPS counter and a step heatmap
(reference: src/app.rs:123-130, src/shader.wgsl:263-265); here we add wall
timers and optional XLA profiler traces.
"""

from __future__ import annotations

import contextlib
import time


class FrameTimer:
    """Rolling FPS/frame-time tracker (reference: src/app.rs:123-130)."""

    def __init__(self, window: int = 30):
        self.window = window
        self._times: list[float] = []

    def tick(self) -> float:
        """Record a frame boundary; returns instantaneous FPS (0 on first)."""
        now = time.perf_counter()
        self._times.append(now)
        if len(self._times) > self.window:
            self._times.pop(0)
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[-2]
        return 1.0 / dt if dt > 0 else 0.0

    @property
    def fps(self) -> float:
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else 0.0


@contextlib.contextmanager
def xla_trace(log_dir: str = "/tmp/ot_tpu_trace"):
    """Capture an XLA profiler trace around a block (view with xprof/TB)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"{label}: {(time.perf_counter() - t0) * 1e3:.1f} ms")
