"""Tracing / profiling as a first-class module.

The reference has none (SURVEY §5: wall-clock prints only). Here:
``trace`` wraps jax.profiler for on-demand TPU traces, ``StepTimer``
gives EMA'd per-step timing + clips/s, and ``log_compile_time`` brackets
first-call compilation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sdumc_trace", enabled: bool = True):
    """jax.profiler trace context; view with tensorboard/xprof."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock with EMA and clips/s accounting."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self.count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        self.count += 1

    def clips_per_sec(self, batch_size: int) -> float:
        return batch_size / self.avg if self.avg else 0.0


@contextlib.contextmanager
def log_compile_time(label: str, log=print):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if dt > 1.0:
        log(f"[compile] {label}: {dt:.1f}s")
