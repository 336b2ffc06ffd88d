"""Profiling / observability (SURVEY.md §5 tracing equivalent).

The reference used Lightning's 'simple' profiler + GPUStatsMonitor
(``main.py:37``, ``system.py:87-89``).  TPU-native equivalents:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing
    TensorBoard-loadable XPlane traces of device execution;
  * ``StepTimer`` — host-side per-step wall-time stats (mean/p50/p95),
    the 'simple' profiler analogue;
  * ``device_memory_stats()`` — per-device HBM usage.
"""

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir="output/profile"):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window=200):
        self.window = window
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        if len(self.times) > self.window:
            self.times = self.times[-self.window:]

    def stats(self):
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {
            "steps": len(a),
            "mean_ms": float(a.mean() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p95_ms": float(np.percentile(a, 95) * 1e3),
            "steps_per_sec": float(1.0 / a.mean()),
        }


def device_memory_stats():
    import jax
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return out
