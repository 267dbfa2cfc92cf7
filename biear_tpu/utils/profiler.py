"""Profiling: jax.profiler traces + a lightweight step timer.

The reference has no profiling at all (SURVEY.md §5). Here:
  * `trace(logdir)` context manager wraps any region in a jax.profiler
    trace (viewable in TensorBoard / Perfetto);
  * `StepTimer` collects wall-clock step times with compile-step
    exclusion and reports mean/p50/p95 and utterances/sec;
  * `annotate(name)` adds a named TraceAnnotation around host code so the
    input pipeline shows up next to device streams.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with warmup exclusion.

    Usage:
        t = StepTimer(warmup=2)
        for batch in ...:
            with t.step(batch_size):
                run_step(...)
        print(t.report())
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self.items: list[int] = []
        self._n = 0

    @contextlib.contextmanager
    def step(self, n_items: int = 1):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)
            self.items.append(n_items)

    def report(self) -> dict:
        if not self.times:
            return {"steps": 0}
        ts = np.asarray(self.times)
        total_items = float(np.sum(self.items))
        return {
            "steps": len(ts),
            "mean_ms": float(ts.mean() * 1e3),
            "p50_ms": float(np.percentile(ts, 50) * 1e3),
            "p95_ms": float(np.percentile(ts, 95) * 1e3),
            "items_per_sec": total_items / float(ts.sum()),
        }
