"""Profiling hooks: step timing + optional jax.profiler traces.

The reference has no tracing/profiling beyond tqdm (SURVEY.md §5); this is
the capability-gap fill: a cheap rolling step timer for clips/sec telemetry
and a context manager around ``jax.profiler`` for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


class StepTimer:
    """Rolling throughput meter (wall-clock, host-side)."""

    def __init__(self, window: int = 50):
        self._times = deque(maxlen=window + 1)

    def tick(self) -> None:
        self._times.append(time.perf_counter())

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else 0.0


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """Capture a jax.profiler trace into ``logdir`` (viewable in TB)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
