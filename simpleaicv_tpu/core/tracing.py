"""Tracing / profiling utilities (SURVEY.md §5: the reference has only manual
AverageMeter wall-clocks around load/forward with cuda.synchronize
(tools/scripts.py:48-54); the TPU-native equivalents are jax.profiler traces
plus fetch-forced step timing — on relayed platforms block_until_ready can
return early, so timings use host fetches)."""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step timing with a host fetch as the completion barrier."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, fetch_value=None):
        if fetch_value is not None:
            np.asarray(fetch_value)  # force completion
        self.times.append(time.perf_counter() - self._t0)

    def summary(self):
        t = np.asarray(self.times[1:] or self.times)
        return {"mean_s": float(t.mean()), "p50_s": float(np.median(t)),
                "p90_s": float(np.percentile(t, 90)), "steps": len(t)}
