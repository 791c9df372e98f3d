"""Tracing / profiling utilities (SURVEY.md §5 'Tracing' plan).

The reference's only instrumentation is a wall-clock pair printed every 500
iterations (run_nerf_acc.py:264,335-336). Here:
  * ``StepTimer`` — per-step timing with EMA + the reference's printed
    "Time for iteration N" line for parity;
  * ``trace`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-viewable trace directory;
  * ``annotate`` — named TraceAnnotation for kernels inside a step;
  * ``debug_nans`` — scoped ``jax_debug_nans`` toggle (the TPU-native
    answer to 'sanitizers': fail fast at the op that produced the NaN).
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """EMA step timer; ``.iteration_line(n)`` matches the reference's print
    format at run_nerf_acc.py:336."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg_s = None
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg_s = dt if self.avg_s is None else (
            self.ema * self.avg_s + (1 - self.ema) * dt
        )
        return dt

    def iteration_line(self, n_iter: int) -> str:
        return f"Time for iteration {n_iter} = {self.avg_s}"

    def rays_per_sec(self, rays_per_step: int) -> float:
        return rays_per_step / self.avg_s if self.avg_s else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a traced step."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped NaN checking: re-runs the op that produced a NaN un-jitted and
    raises at the exact primitive."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
