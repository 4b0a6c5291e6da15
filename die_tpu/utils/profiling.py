"""Tracing / profiling hooks — the observability the reference lacks
(SURVEY §5.1: tqdm postfix + logging.info only).

* ``trace(...)`` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable trace directory.
* ``annotate(name)`` — named scope that shows up in device traces
  (``jax.profiler.TraceAnnotation``); wrap substeps or rollout chunks.
* ``StepTimer`` — host-side steps/s counter with exponential smoothing, for
  progress displays and JSONL metrics.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Tracks env-steps/s across rollout chunks (host wall-clock)."""

    def __init__(self, smoothing: float = 0.9):
        self._smoothing = smoothing
        self._rate = None
        self._last = None
        self.total_steps = 0

    def update(self, env_steps: int) -> float:
        now = time.perf_counter()
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            rate = env_steps / dt
            self._rate = (rate if self._rate is None
                          else self._smoothing * self._rate
                          + (1 - self._smoothing) * rate)
        self._last = now
        self.total_steps += env_steps
        return self._rate or 0.0

    @property
    def rate(self) -> float:
        return self._rate or 0.0
