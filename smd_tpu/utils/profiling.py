"""Profiling + numerics-debug hooks (SURVEY.md §5 aux subsystems).

The reference shipped only wall-clock counters (``train_ncsn.py:367-372``)
with ``tensorboard-plugin-profile`` unused in requirements. Here:

- ``trace``: context manager around ``jax.profiler`` writing a TensorBoard
  profile (xplane) to ``<dir>/plugins/profile``.
- ``annotate``: named TraceAnnotation for host-side structure in profiles.
- ``enable_nan_debugging``: flips ``jax_debug_nans`` (the functional-JAX
  analogue of a sanitizer).
"""
from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate", "enable_nan_debugging"]


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
