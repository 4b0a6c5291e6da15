"""Tracing / profiling hooks — the observability the reference lacks
(SURVEY §5.1: tqdm postfix + logging.info only).

* ``trace(...)`` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable trace directory.
* ``annotate(name)`` — HOST-side named region (``jax.profiler
  .TraceAnnotation``): wrap the host call that launches a rollout chunk.
  Inside ``jit`` it would fire at trace time only — use ``named_scope``
  there instead.
* ``named_scope(name)`` — DEVICE-side naming for code under ``jit``
  (``jax.named_scope``): attaches the scope name to the HLO ops it
  encloses, so substeps are attributable in TensorBoard traces and XLA op
  profiles.  Pure metadata — zero runtime cost, no effect on compiled code
  (the engine's bit-exactness tests run with the scopes in place).
* ``StepTimer`` — host-side steps/s counter with exponential smoothing, for
  progress displays and JSONL metrics.

The six exact-engine substeps (core/env.py) are wrapped in ``named_scope``
scopes named ``die/<substep>``; rollout chunks launched by
``examples/benchmark_scaling.py --trace <dir>`` are wrapped in ``annotate``
— see docs/PERF.md for a captured trace artifact.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str, python_tracer: bool = False):
    """``jax.profiler.trace`` with the Python-interpreter tracer OFF by
    default: at level 1 it emits ~1M `$builtins isinstance`-style events
    (~50 MB per short capture) that bury the device timeline; host + device
    activity and TraceAnnotation regions are level-independent."""
    import jax

    try:
        opts = jax.profiler.ProfileOptions()
        opts.python_tracer_level = 1 if python_tracer else 0
        cm = jax.profiler.trace(logdir, profiler_options=opts)
    except (TypeError, AttributeError):
        # older jax: either trace() rejects profiler_options (TypeError) or
        # jax.profiler has no ProfileOptions at all (AttributeError)
        cm = jax.profiler.trace(logdir)
    with cm:
        yield


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def named_scope(name: str):
    import jax

    return jax.named_scope(name)


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
