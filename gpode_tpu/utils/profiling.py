"""Tracing/profiling hooks (SURVEY.md §5: the reference only counted rhs evals).

Wraps `jax.profiler` for on-demand device traces plus lightweight throughput
reporting (steps/sec, rhs-evals/sec from solver stats) and a NaN-debugging
switch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf.

    with profiling.trace("/tmp/gpode-trace"):
        step(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enabled: bool = True):
    """Raise on NaN production inside jitted code (reruns the offending
    computation un-jitted to localize it)."""
    jax.config.update("jax_debug_nans", enabled)


class ThroughputMeter:
    """Steps/sec and rhs-evals/sec over a sliding window of host-synced steps."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0: Optional[float] = None
        self.steps = 0
        self.rhs_evals = 0

    def update(self, nfe: int = 0, batch_evals: int = 1):
        if self._t0 is None:
            self._t0 = time.perf_counter()
        self.steps += 1
        self.rhs_evals += nfe * batch_evals

    @property
    def elapsed(self) -> float:
        return 0.0 if self._t0 is None else time.perf_counter() - self._t0

    @property
    def steps_per_sec(self) -> float:
        e = self.elapsed
        return self.steps / e if e > 0 else 0.0

    @property
    def rhs_evals_per_sec(self) -> float:
        e = self.elapsed
        return self.rhs_evals / e if e > 0 else 0.0
