"""Profiling and tracing hooks.

The reference has no tracing at all (SURVEY §5). Here: a step timer with
summary statistics, and a context manager around jax.profiler so any
training/painting region can emit a TensorBoard-compatible device trace.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np

__all__ = ["StepTimer", "device_trace"]


class StepTimer:
    """Wall-clock per-step timing with percentile summaries."""

    def __init__(self, skip_first: int = 1):
        self.times: List[float] = []
        self.skip_first = skip_first
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> Dict[str, float]:
        t = np.asarray(self.times[self.skip_first:] or self.times)
        return {"n": len(t),
                "mean_ms": float(t.mean() * 1e3),
                "p50_ms": float(np.percentile(t, 50) * 1e3),
                "p95_ms": float(np.percentile(t, 95) * 1e3),
                "max_ms": float(t.max() * 1e3)}


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Wrap a region in a jax.profiler trace (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
