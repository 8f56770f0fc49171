"""Per-stage timing and counters.

The reference's only telemetry is driver-level wall-clock medians
(/root/reference/Examples/Monocular/mono_tum.cc:116-124) and scattered
couts. Here every pipeline stage can be timed (host wall-clock around the
jitted calls — device work is async, so these are dispatch+sync costs
unless `sync` forces materialization), counters accumulate pipeline events,
and `jax_trace` wraps a block in the JAX profiler for device-level traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class StageTimer:
    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        out = {}
        for name, xs in self.samples.items():
            arr = np.asarray(xs)
            out[name] = {
                "n": len(arr),
                "median_ms": float(np.median(arr) * 1e3),
                "mean_ms": float(np.mean(arr) * 1e3),
                "p90_ms": float(np.percentile(arr, 90) * 1e3),
            }
        return out


class Metrics:
    """Counters + timers for a SLAM session."""

    def __init__(self):
        self.counters = defaultdict(int)
        self.timer = StageTimer()

    def inc(self, name: str, by: int = 1):
        self.counters[name] += by

    def stage(self, name: str):
        return self.timer.stage(name)

    def report(self) -> dict:
        return {"counters": dict(self.counters), "stages": self.timer.summary()}


@contextlib.contextmanager
def jax_trace(logdir: str):
    """Capture a device-level profiler trace viewable with TensorBoard /
    xprof (the 'first-class tracing' upgrade over the reference)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
