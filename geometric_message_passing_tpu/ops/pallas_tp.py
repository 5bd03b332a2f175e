"""Pallas TPU kernel for the per-edge weighted CG contraction (TP stage 2).

The hot contraction of TFN/MACE's ``TensorProductConvLayer`` is, per output
irrep group,

    out[e, w, m] = sum_k T[e, k, m] * W[e, k, w]        k = (path, u)

with W the per-edge weight giant ([E, sum_p u*w] ~ 94k floats/edge at 64
channels, max_ell 3 — reference hot kernel: the e3nn TensorProduct inside
/root/reference/models/layers/tfn_layer.py:68-85).  As a plain XLA
dot_general this is a batched-GEMM over E whose MXU lowering wants E-minor
(lane-dim) physical layouts, while every surrounding op (edge gathers,
elementwise, the MLP producing W) is E-major — the compiled TFN train step
relayouts ~4.5 GB per step in `copy` instructions (measured; RESULTS.md).

MEASURED OUTCOME (TPU v5e, TFN max_ell=3 group shapes, E=1536): this kernel
is 7.2/12.9 ms fwd / fwd+bwd across the four groups vs 1.66/2.77 ms for
XLA's own batched-GEMM lowering when the operands arrive layout-free — the
per-grid-step overhead and small-tile MXU utilization lose to XLA.  The
production fix for the relayout problem was producer-side instead: the edge
MLP emits the weights per output-irrep group (nn/conv.py fc_heads +
EdgeTensorProduct.apply_grouped), so no giant slice/copy ever exists.  The
kernel is KEPT as a tested reference implementation of the E-major tiling
pattern (tests/test_pallas.py), not used by model code.

Tiling:

  * grid (E/te, K/kc), K innermost; the out block revisits per K step and
    accumulates (zeroed at k==0) — Mosaic keeps it resident in VMEM.
  * T is passed TRANSPOSED as Tt [E, m, K] (done in XLA by the wrapper — T
    is the small CG intermediate, ~40MB total; W must not be transposed).
    With K in lanes both dot operands contract over their lane axis (the
    natural A@B^T MXU form) and no VMEM tile wastes lanes on m<=7.
  * backward = one more kernel with the same tiling, no accumulation
    (each (e,k) chunk owns its dT/dW output block):
        dW[e,k,w] = sum_m Tt[e,m,k] dO[e,w,m]
        dTt[e,m,k] = sum_w W[e,k,w] dO[e,w,m]

jax.custom_vjp wraps the pallas pair; the E-pad/K-pad/transpose glue stays
outside in XLA, whose autodiff handles it.  An einsum twin (`_contract_xla`)
serves CPU runs and tests; on CPU backends the public wrapper routes to the
twin (same policy as ops/pallas_edge.py::_is_cpu).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_edge import _is_cpu


def _contract_xla(T, W):
    """out[e, w, m] = sum_k T[e,k,m] W[e,k,w] — correctness twin."""
    return jnp.einsum("...km,...kw->...wm", T,
                      W.astype(T.dtype) if W.dtype != T.dtype else W)


def _fwd_kernel(tt_ref, w_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    Tt = tt_ref[...]                    # [te, m, kc]
    W = w_ref[...].astype(jnp.float32)  # [te, kc, w]
    out_ref[...] += jax.lax.dot_general(
        W, Tt, (((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)             # [te, w, m]


def _bwd_kernel(tt_ref, w_ref, do_ref, dtt_ref, dw_ref):
    Tt = tt_ref[...]                    # [te, m, kc]
    W = w_ref[...].astype(jnp.float32)  # [te, kc, w]
    dO = do_ref[...]                    # [te, w, m]
    # dTt[e,m,k] = sum_w W[e,k,w] dO[e,w,m]
    dtt_ref[...] = jnp.swapaxes(
        jax.lax.dot_general(
            W, dO, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ), 1, 2).astype(dtt_ref.dtype)  # [te, kc, m] -> [te, m, kc]
    # dW[e,k,w] = sum_m Tt[e,m,k] dO[e,w,m]
    dw_ref[...] = jax.lax.dot_general(
        Tt, dO, (((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dw_ref.dtype)              # [te, kc, w]


def _pad_axis(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x


@functools.partial(jax.jit, static_argnames=("te", "kc", "interpret"))
def _contract_fwd_pallas(Tt, W, te: int, kc: int, interpret: bool):
    e, m, k = Tt.shape
    w = W.shape[-1]
    Tt = _pad_axis(_pad_axis(Tt, te, 0), kc, 2)
    W = _pad_axis(_pad_axis(W, te, 0), kc, 1)
    ep, kp = Tt.shape[0], Tt.shape[2]
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(ep // te, kp // kc),
        in_specs=[
            pl.BlockSpec((te, m, kc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((te, kc, w), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((te, w, m), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((ep, w, m), jnp.float32),
        interpret=interpret,
    )(Tt, W)
    return out[:e]


@functools.partial(jax.jit, static_argnames=("te", "kc", "interpret"))
def _contract_bwd_pallas(Tt, W, dO, te: int, kc: int, interpret: bool):
    e, m, k = Tt.shape
    w = W.shape[-1]
    Ttp = _pad_axis(_pad_axis(Tt, te, 0), kc, 2)
    Wp = _pad_axis(_pad_axis(W, te, 0), kc, 1)
    dOp = _pad_axis(dO, te, 0)
    ep, kp = Ttp.shape[0], Ttp.shape[2]
    dTt, dW = pl.pallas_call(
        _bwd_kernel,
        grid=(ep // te, kp // kc),
        in_specs=[
            pl.BlockSpec((te, m, kc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((te, kc, w), lambda i, j: (i, j, 0)),
            pl.BlockSpec((te, w, m), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((te, m, kc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((te, kc, w), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ep, m, kp), Tt.dtype),
            jax.ShapeDtypeStruct((ep, kp, w), W.dtype),
        ],
        interpret=interpret,
    )(Ttp, Wp, dOp)
    return dTt[:e, :, :k], dW[:e, :k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _contract_pallas(Tt, W, te: int, kc: int, interpret: bool):
    return _contract_fwd_pallas(Tt, W, te, kc, interpret)


def _contract_pallas_fwd(Tt, W, te, kc, interpret):
    return _contract_fwd_pallas(Tt, W, te, kc, interpret), (Tt, W)


def _contract_pallas_bwd(te, kc, interpret, res, dO):
    Tt, W = res
    # the bwd kernel holds ~2x the fwd working set (dTt+dW outputs), so it
    # runs at half the edge tile to stay inside the 16MB VMEM budget
    return _contract_bwd_pallas(Tt, W, dO, max(8, te // 2), kc, interpret)


_contract_pallas.defvjp(_contract_pallas_fwd, _contract_pallas_bwd)


def edge_weighted_contract(T, W, te: int = 32, kc: int = 128,
                           force: str | None = None):
    """out[e, w, m] = sum_k T[e,k,m] W[e,k,w], E-major Pallas kernel on TPU.

    T: [E, K, m] f32 CG intermediate; W: [E, K, w] f32/bf16 per-edge
    weights.  Returns [E, w, m] f32.  ``force`` overrides dispatch: "xla"
    (einsum twin), "pallas", or "interpret" (Mosaic interpreter, tests).
    """
    if force == "xla" or (force is None and _is_cpu()):
        return _contract_xla(T, W)
    interpret = force == "interpret"
    Tt = jnp.swapaxes(T, 1, 2)   # small; XLA autodiff covers the transpose
    return _contract_pallas(Tt, W, te, kc, interpret)
