"""Tracing/profiling hooks (SURVEY.md §5: the reference only counted rhs evals).

Wraps `jax.profiler` for on-demand device traces and a NaN-debugging switch.
Throughput (steps/s, rhs-evals/s) is reported by the Trainer's log lines and
by `bench.py`.
"""

from __future__ import annotations

import contextlib

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
