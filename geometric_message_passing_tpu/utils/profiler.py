"""Profiling / tracing — a subsystem absent in the reference (only wall-clock
epoch timing, train_utils.py:70). Wraps jax.profiler for TensorBoard/XProf
traces plus a lightweight steady-state timer for kernel benchmarking."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/gmp_trace"):
    """Capture a device trace viewable in TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10, **kw):
    """Steady-state wall time of a jitted function (seconds/call)."""
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
