"""Profiling / tracing utilities — the TPU-native answer to the reference's
wall-clock-only instrumentation (SURVEY.md §5: the reference has no tracing
beyond an FPS micro-benchmark, `/root/reference/evaluation/metrics.py:63-93`,
and percent-progress prints, `training/trainer.py:155-165`).

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable XPlane trace of device execution.
- ``StepTimer``: lightweight per-step wall-clock stats (mean/p50/p95,
  images/sec) with warmup exclusion — used by the Trainer for per-epoch
  throughput reporting.
- ``annotate``: named trace regions (shows up in the profiler timeline).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """jax.profiler trace context; writes to ``logdir``."""
    import jax
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step timing with warmup exclusion.

    The first ``warmup`` recorded steps (compilation) are excluded from the
    statistics.
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._all: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self._all.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    @property
    def times(self) -> np.ndarray:
        return np.asarray(self._all[self.warmup:])

    def summary(self, batch_size: Optional[int] = None) -> Dict[str, float]:
        t = self.times
        if t.size == 0:
            return {"steps": 0}
        out = {
            "steps": int(t.size),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "total_s": float(np.asarray(self._all).sum()),
        }
        if batch_size:
            out["images_per_sec"] = batch_size / out["mean_s"]
        return out

    def reset(self) -> None:
        self._all.clear()
