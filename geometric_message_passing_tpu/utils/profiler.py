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


def cost_report(fn: Callable, *args, peak_flops: float = 197e12,
                peak_bytes_per_s: float = 819e9, **kw) -> dict:
    """Static roofline estimate of a jittable function: XLA's own
    FLOP/byte-traffic cost analysis vs hardware peaks (defaults: TPU v5e
    bf16 MXU 197 TFLOP/s, HBM 819 GB/s).  Combine with ``time_fn`` for the
    measured-vs-roofline gap; at this framework's graph sizes the gap is
    dominated by per-kernel launch overhead, so ``hlo_ops`` (fusion count
    proxy) is the number to optimize."""
    import jax

    compiled = jax.jit(fn).lower(*args, **kw).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns [dict]
        costs = costs[0] if costs else {}
    flops = float(costs.get("flops", 0.0))
    bytes_accessed = float(costs.get("bytes accessed", 0.0))
    text = compiled.as_text()
    n_fusions = text.count(" fusion(") + text.count(" fusion.")
    return dict(
        flops=flops,
        bytes_accessed=bytes_accessed,
        t_flops_s=flops / peak_flops,
        t_bytes_s=bytes_accessed / peak_bytes_per_s,
        roofline_bound=("compute" if flops / peak_flops >
                        bytes_accessed / peak_bytes_per_s else "memory"),
        hlo_ops=text.count("\n"),
        fusions=n_fusions,
    )
