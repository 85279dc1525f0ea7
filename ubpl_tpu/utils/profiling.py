"""Tracing/profiling — first-class in the TPU build (the reference has none;
SURVEY §5 "Tracing/profiling: none").

  * jax.profiler trace capture around training regions (view in XProf /
    TensorBoard)
  * per-step wall-clock timers with running percentiles
  * per-epoch phase timing matching the reference's datetime deltas
"""
import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    """Capture a jax.profiler trace for the enclosed region."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with percentile summaries."""

    def __init__(self, warmup=2):
        self.warmup = warmup
        self.times = []
        self._t0 = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self):
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {"steps": len(arr), "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p90_s": float(np.percentile(arr, 90)),
                "max_s": float(arr.max())}

    def images_per_sec(self, batch_size):
        if not self.times:
            return 0.0
        return batch_size / float(np.mean(self.times))


class PhaseTimer:
    """Named phase timing (reference per-epoch 'xx finished...' logging)."""

    def __init__(self):
        self.phases = {}

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        yield
        self.phases.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self):
        return {k: float(np.sum(v)) for k, v in self.phases.items()}
