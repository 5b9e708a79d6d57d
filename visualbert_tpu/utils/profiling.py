"""Profiling / step-timing hooks.

The reference's only instrumentation is a wall-clock batch timer
(``pytorch_misc.py:21-36``). Here: first-class ``jax.profiler`` traces plus
a throughput meter suitable for the fit loop.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax profiler trace (open with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Examples/sec + sec/step with periodic reset (the reference resets its
    timer every 100 batches to shed warmup skew)."""

    def __init__(self, reset_every: int = 100):
        self.reset_every = reset_every
        self._t0: Optional[float] = None
        self._steps = 0
        self._examples = 0

    def step(self, batch_size: int):
        now = time.perf_counter()
        if self._t0 is None or self._steps >= self.reset_every:
            self._t0, self._steps, self._examples = now, 0, 0
        self._steps += 1
        self._examples += batch_size

    @property
    def sec_per_step(self) -> float:
        if not self._steps or self._t0 is None:
            return float("nan")
        return (time.perf_counter() - self._t0) / self._steps

    @property
    def examples_per_sec(self) -> float:
        if not self._examples or self._t0 is None:
            return float("nan")
        return self._examples / max(time.perf_counter() - self._t0, 1e-9)
