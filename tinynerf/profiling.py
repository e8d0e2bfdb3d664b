"""Profiling / tracing: jax.profiler traces + a rays/sec meter.

The reference has no profiling of any kind (SURVEY.md §5 — only tqdm bars).
Here: ``trace(log_dir)`` context captures an XLA/TPU trace viewable in
TensorBoard or Perfetto, and :class:`Throughput` tracks a windowed rays/sec
meter the Runner prints at logging cadence.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace for the enclosed steps."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Windowed rays/sec meter (counts host-loop dispatches, so it reflects
    sustained device throughput when dispatch isn't the bottleneck)."""

    def __init__(self, rays_per_step: int):
        self.rays_per_step = rays_per_step
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    @property
    def rays_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        if dt <= 0:
            return 0.0
        return self._steps * self.rays_per_step / dt

    def window(self) -> float:
        """Read the meter and reset the window."""
        value = self.rays_per_sec
        self.reset()
        return value
