"""Roofline counters for compiled train/eval steps.

SURVEY §5: the reference has no profiling at all; the TPU build mandates
"jax.profiler trace + per-kernel roofline counters" as a new subsystem.
utils/profiler.py covers tracing; this module covers the counters: it pulls
XLA's own cost analysis (FLOPs, bytes accessed, transcendentals) off a
lowered+compiled function and combines it with a measured step time into
achieved-vs-peak roofline coordinates.

Works on any backend (the analysis is static); peak numbers default to one
TPU v5e chip (197 bf16 TFLOP/s, 819 GB/s HBM) and can be overridden.

CAVEAT: cost analysis reflects the HLO of the backend that compiled it.
Counters pulled from a host-CPU compile (scripts/roofline_report.py) are an
UPPER BOUND on TPU HBM traffic — the TPU backend fuses more aggressively —
so achieved_gbps and frac_of_roof measured against them can exceed the
physical peak/1.0; treat them as "traffic the TPU program avoided", not a
violation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax

# One TPU v5e chip (public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_BYTES = 819e9


@dataclass
class Roofline:
    """Static XLA cost counters + (optional) measured achieved rates."""

    flops: float                    # per execution
    bytes_accessed: float           # per execution (HBM traffic, XLA model)
    transcendentals: float
    intensity: float                # flops / bytes (operational intensity)
    ridge: float                    # peak_flops / peak_bytes (chip ridge point)
    bound: str                      # "compute" or "memory" (static)
    step_time_s: Optional[float] = None
    achieved_tflops: Optional[float] = None
    achieved_gbps: Optional[float] = None
    frac_of_roof: Optional[float] = None   # achieved / attainable-at-intensity

    def row(self) -> dict:
        out = {
            "gflops_per_step": round(self.flops / 1e9, 2),
            "mb_per_step": round(self.bytes_accessed / 1e6, 2),
            "intensity_flop_per_byte": round(self.intensity, 2),
            "static_bound": self.bound,
        }
        if self.step_time_s is not None:
            out.update(
                step_ms=round(self.step_time_s * 1e3, 3),
                achieved_tflops=round(self.achieved_tflops / 1e12, 3),
                achieved_gbps=round(self.achieved_gbps / 1e9, 1),
                frac_of_roof=round(self.frac_of_roof, 3),
            )
        return out


def cost_analysis(fn: Callable, *args, **kwargs) -> dict:
    """XLA cost analysis of jit(fn)(*args): {'flops', 'bytes accessed', ...}.

    Uses AOT lower+compile so nothing executes (device-independent)."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):   # older jax returns one dict per device
        ca = ca[0]
    return dict(ca or {})


def roofline(fn: Callable, *args, step_time_s: Optional[float] = None,
             peak_flops: float = V5E_PEAK_FLOPS,
             peak_bytes: float = V5E_PEAK_BYTES, **kwargs) -> Roofline:
    """Roofline coordinates of one execution of jit(fn)(*args).

    ``step_time_s``: measured wall time per execution (e.g. from a fetched
    lax.scan loop per CLAUDE.md timing protocol) — adds achieved rates and
    the fraction of the attainable roof at this intensity."""
    ca = cost_analysis(fn, *args, **kwargs)
    flops = float(ca.get("flops", 0.0))
    nbytes = float(ca.get("bytes accessed", 0.0))
    trans = float(ca.get("transcendentals", 0.0))
    intensity = flops / nbytes if nbytes else float("inf")
    ridge = peak_flops / peak_bytes
    r = Roofline(
        flops=flops, bytes_accessed=nbytes, transcendentals=trans,
        intensity=intensity, ridge=ridge,
        bound="compute" if intensity >= ridge else "memory",
    )
    if step_time_s:
        r.step_time_s = step_time_s
        r.achieved_tflops = flops / step_time_s
        r.achieved_gbps = nbytes / step_time_s
        attainable = min(peak_flops, intensity * peak_bytes)
        r.frac_of_roof = (flops / step_time_s) / attainable
    return r
