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


def xplane_op_summary(logdir: str, top_n: int = 25):
    """Aggregate a ``trace()`` capture's device ops by instruction group.

    Parses the raw ``*.xplane.pb`` (no tensorboard plugin needed) and returns
    ``[(group, total_ms, count), ...]`` sorted by time, where ``group`` is
    the HLO instruction-name prefix plus output-shape signature — the
    accounting used throughout BASELINE.md's roofline analysis. ``while``
    wrappers are excluded so nested ops aren't double counted.
    """
    import glob
    import os
    import re
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    agg = defaultdict(lambda: [0.0, 0])
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                if name.lstrip("%").startswith("while"):
                    continue
                inst = name.split(" = ")[0]
                pref = re.sub(r"\.\d+$", "", inst)
                m = re.search(r"=\s+((?:\([^)]*\)|\S+))\s", name)
                shape = m.group(1)[:50] if m else ""
                k = f"{pref} {shape}"
                agg[k][0] += ev.duration_ps / 1e9
                agg[k][1] += 1
    rows = sorted(
        ((k, ms, n) for k, (ms, n) in agg.items()), key=lambda r: -r[1]
    )
    return rows[:top_n]
