"""Whole-stack fused EGNN: every message-passing layer in ONE Pallas launch.

The per-layer fused kernel (ops/pallas_edge.py) already collapses each
layer's gather -> message MLP -> position scaling -> masked segment
reductions into one launch, but a 4-layer train step still pays 8 Pallas
launches plus the XLA update-MLP kernels between them — and at our graph
sizes the step is kernel-COUNT-bound (~50-100us fixed cost per kernel on
this hardware), not FLOP-bound.  This kernel runs the ENTIRE stack:

  * forward: grid (L,) — layer l's packed weights stream in per grid step
    while the node state (h, pos) persists across steps in VMEM scratch;
    the update MLP (Linear/LN/relu x2) runs in-kernel, so a whole L-layer
    forward is ONE launch;
  * backward: grid (1,) — ``jax.vjp`` over the unrolled L-layer stack,
    recomputed entirely in VMEM (rematerialisation: zero HBM residuals).

Requires all edges to fit one block (fine for the reference's graph sizes:
batches pad to a few thousand edges); gathers/segment-sums are one-hot MXU
matmuls like the other kernels.  Weight layout per layer ([P, D] rows):
the message/pos rows of ops/pallas_edge.py's packing, then the update MLP
(U1 [2d,d]; ub1,ug1,uB1; U2 [d,d]; ub2,ug2,uB2) — P = 7d + 18.

XLA twin ``egnn_stack_xla`` carries CPU/tests and the grad reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_edge import _is_cpu, _layernorm


def stack_rows(d: int) -> int:
    """Packed rows per layer: message/pos block (4d+12) + update MLP (3d+6)."""
    return 7 * d + 18


def _layer_math(h, pos, W, d, gj, gi, red, cnt, mm, residual):
    """One EGNN layer (message + masked aggregation + update MLP) as pure
    jnp over injected gather (gj/gi), masked-reduce (red) and matmul (mm)
    closures — shared verbatim by the Pallas kernels (one-hot matmuls) and
    the XLA twin (indexing + segment_sum).  Math identical to
    models/egnn.py::EGNNLayer (reference egnn_layer.py:7-89)."""
    r = 0
    W1 = W[r : r + 2 * d + 1]; r += 2 * d + 1
    b1, g1, B1 = W[r], W[r + 1], W[r + 2]; r += 3
    W2 = W[r : r + d]; r += d
    b2, g2, B2 = W[r], W[r + 1], W[r + 2]; r += 3
    P1 = W[r : r + d]; r += d
    pb1, pg1, pB1 = W[r], W[r + 1], W[r + 2]; r += 3
    P2col = W[r]; r += 1
    pb2 = W[r, 0]; r += 1
    U1 = W[r : r + 2 * d]; r += 2 * d
    ub1, ug1, uB1 = W[r], W[r + 1], W[r + 2]; r += 3
    U2 = W[r : r + d]; r += d
    ub2, ug2, uB2 = W[r], W[r + 1], W[r + 2]; r += 3

    h_j, h_i = gj(h), gi(h)
    pos_j, pos_i = gj(pos), gi(pos)
    pd = pos_i - pos_j
    sq = jnp.sum(pd * pd, axis=-1, keepdims=True)
    positive = sq > 1e-24
    dists = jnp.where(positive, jnp.sqrt(jnp.where(positive, sq, 1.0)), 0.0)

    x = jnp.concatenate([h_i, h_j, dists], axis=-1)
    m = jnp.maximum(_layernorm(mm(x, W1) + b1, g1, B1), 0.0)
    msg = jnp.maximum(_layernorm(mm(m, W2) + b2, g2, B2), 0.0)
    p = jnp.maximum(_layernorm(mm(msg, P1) + pb1, pg1, pB1), 0.0)
    scale = jnp.sum(p * P2col[None, :], axis=-1, keepdims=True) + pb2
    pos_msg = pd * scale

    msg_acc = red(msg)
    pos_acc = red(pos_msg) / cnt

    u_in = jnp.concatenate([h, msg_acc], axis=-1)
    u = jnp.maximum(_layernorm(mm(u_in, U1) + ub1, ug1, uB1), 0.0)
    upd = jnp.maximum(_layernorm(mm(u, U2) + ub2, ug2, uB2), 0.0)
    h_new = h + upd if residual else upd
    return h_new, pos + pos_acc


def _onehots(send, recv, emask, n):
    oh_send = (
        send[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    ).astype(jnp.float32)
    oh_recv = (
        recv[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    ).astype(jnp.float32)
    ohT = oh_recv * emask[:, None]
    cnt = jnp.maximum(jnp.sum(ohT, axis=0)[:, None], 1.0)
    return oh_send, oh_recv, ohT, cnt


_MM = lambda a, b: jax.lax.dot_general(
    a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
_MTM = lambda a, b: jax.lax.dot_general(
    a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _stack_fwd_kernel(send_ref, recv_ref, emask_ref, h0_ref, pos0_ref, w_ref,
                      h_out, pos_out, h_s, pos_s, *, n_layers, residual):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _init():
        h_s[...] = h0_ref[...]
        pos_s[...] = pos0_ref[...]

    n, d = h0_ref.shape
    emask = emask_ref[...].astype(jnp.float32)
    oh_send, oh_recv, ohT, cnt = _onehots(send_ref[...], recv_ref[...],
                                          emask, n)
    h_new, pos_new = _layer_math(
        h_s[...], pos_s[...], w_ref[...][0], d,
        gj=lambda a: _MM(oh_send, a), gi=lambda a: _MM(oh_recv, a),
        red=lambda m: _MTM(ohT, m), cnt=cnt, mm=_MM, residual=residual,
    )
    h_s[...] = h_new
    pos_s[...] = pos_new

    @pl.when(l == n_layers - 1)
    def _emit():
        h_out[...] = h_new
        pos_out[...] = pos_new


def _stack_bwd_kernel(send_ref, recv_ref, emask_ref, h0_ref, pos0_ref, w_ref,
                      gh_ref, gpos_ref, dh0_out, dpos0_out, dw_ref,
                      h_ck, pos_ck, dh_s, dpos_s, *, n_layers, residual):
    """Stack backward with BOUNDED VMEM: grid step k handles layer
    l = L-1-k.  Step 0 re-runs the forward once, storing only the (h, pos)
    layer-input checkpoints in VMEM scratch; every step then runs ONE
    layer's ``jax.vjp`` at its checkpoint, carrying the cotangents in
    scratch and streaming that layer's dW block out.  A straight-line
    whole-stack formulation (single grid step) gets CSE'd back into
    keeping every layer's edge intermediates live at once and overflows
    VMEM at D=128, L=4 (measured 141M > 128M); the grid structurally
    bounds the live set to one layer."""
    k = pl.program_id(0)
    l_dyn = n_layers - 1 - k
    n, d = h0_ref.shape
    emask = emask_ref[...].astype(jnp.float32)
    oh_send, oh_recv, ohT, cnt = _onehots(send_ref[...], recv_ref[...],
                                          emask, n)

    def layer_fn(h, pos, W):
        return _layer_math(
            h, pos, W, d,
            gj=lambda a: _MM(oh_send, a), gi=lambda a: _MM(oh_recv, a),
            red=lambda m: _MTM(ohT, m), cnt=cnt, mm=_MM, residual=residual,
        )

    @pl.when(k == 0)
    def _init():
        h_ck[0], pos_ck[0] = h0_ref[...], pos0_ref[...]
        h, pos = h0_ref[...], pos0_ref[...]
        for i in range(n_layers - 1):
            h, pos = layer_fn(h, pos, w_ref[i])
            h_ck[i + 1], pos_ck[i + 1] = h, pos
        dh_s[...] = gh_ref[...]
        dpos_s[...] = gpos_ref[...]

    # dynamic layer index: ref-level dynamic loads (pl.ds) — value-level
    # dynamic_slice is not implemented in the Mosaic TC lowering
    h_in = h_ck[pl.ds(l_dyn, 1), :, :][0]
    pos_in = pos_ck[pl.ds(l_dyn, 1), :, :][0]
    Wl = w_ref[pl.ds(l_dyn, 1), :, :][0]
    _, vjp = jax.vjp(layer_fn, h_in, pos_in, Wl)
    dh, dpos, dWl = vjp((dh_s[...], dpos_s[...]))
    dh_s[...] = dh
    dpos_s[...] = dpos
    dw_ref[...] = dWl[None]

    @pl.when(k == n_layers - 1)
    def _emit():
        dh0_out[...] = dh
        dpos0_out[...] = dpos


def egnn_stack_xla(send, recv, emask, h0, pos0, Wall, n_layers: int,
                   residual: bool = True):
    """XLA twin: identical math via indexing + masked segment sums."""
    from .scatter import segment_sum

    n, d = h0.shape
    cnt = jnp.maximum(
        segment_sum(jnp.ones((send.shape[0], 1), h0.dtype), recv, n,
                    mask=emask), 1.0)
    h, pos = h0, pos0
    for l in range(n_layers):
        h, pos = _layer_math(
            h, pos, Wall[l], d,
            gj=lambda a: a[send], gi=lambda a: a[recv],
            red=lambda m: segment_sum(m, recv, n, mask=emask), cnt=cnt,
            mm=lambda a, b: a @ b, residual=residual,
        )
    return h, pos


def _pad_edges_one_block(send, recv, emask):
    e = send.shape[0]
    be = -(-e // 1024) * 1024  # 1-D int32 operands tile at 1024 (Mosaic)
    pad = be - e
    if pad:
        send = jnp.pad(send, (0, pad))
        recv = jnp.pad(recv, (0, pad))
        emask = jnp.pad(emask, (0, pad))
    return send, recv, emask


def make_egnn_stack_fused(d: int, n_layers: int, residual: bool = True,
                          interpret: bool = False, pallas_bwd: bool = True):
    """Whole-stack fused forward/backward as a custom_vjp closure.

    Signature: (send, recv, emask, h0 [N,D], pos0 [N,3], Wall [L,P,D])
    -> (h [N,D], pos [N,3]).  All edges run as one block; the forward is one
    launch (grid over layers), the backward one launch (vjp over the
    unrolled stack, recomputed in VMEM).  ``pallas_bwd=False`` differentiates
    the XLA twin instead (grad correctness reference)."""

    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def _run_fwd(send, recv, emask, h0, pos0, Wall):
        if _is_cpu() and not interpret:
            return egnn_stack_xla(send, recv, emask, h0, pos0, Wall,
                                  n_layers, residual)
        send, recv, emask = _pad_edges_one_block(send, recv, emask)
        be = send.shape[0]
        n = h0.shape[0]
        kernel = functools.partial(_stack_fwd_kernel, n_layers=n_layers,
                                   residual=residual)
        return pl.pallas_call(
            kernel,
            grid=(n_layers,),
            in_specs=[
                pl.BlockSpec((be,), lambda l: (0,)),
                pl.BlockSpec((be,), lambda l: (0,)),
                pl.BlockSpec((be,), lambda l: (0,)),
                pl.BlockSpec(h0.shape, lambda l: (0, 0)),
                pl.BlockSpec(pos0.shape, lambda l: (0, 0)),
                pl.BlockSpec((1,) + Wall.shape[1:], lambda l: (l, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec(h0.shape, lambda l: (0, 0)),
                pl.BlockSpec(pos0.shape, lambda l: (0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(h0.shape, jnp.float32),
                jax.ShapeDtypeStruct(pos0.shape, jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((n, d), jnp.float32),
                pltpu.VMEM((n, 3), jnp.float32),
            ],
            compiler_params=cp,
            interpret=interpret or _is_cpu(),
        )(send, recv, emask, h0, pos0, Wall)

    def _run_bwd(send, recv, emask, h0, pos0, Wall, gh, gpos):
        send, recv, emask = _pad_edges_one_block(send, recv, emask)
        be = send.shape[0]
        n = h0.shape[0]
        kernel = functools.partial(_stack_bwd_kernel, n_layers=n_layers,
                                   residual=residual)
        return pl.pallas_call(
            kernel,
            grid=(n_layers,),
            in_specs=[
                pl.BlockSpec((be,), lambda k: (0,)),
                pl.BlockSpec((be,), lambda k: (0,)),
                pl.BlockSpec((be,), lambda k: (0,)),
                pl.BlockSpec(h0.shape, lambda k: (0, 0)),
                pl.BlockSpec(pos0.shape, lambda k: (0, 0)),
                pl.BlockSpec(Wall.shape, lambda k: (0, 0, 0)),
                pl.BlockSpec(gh.shape, lambda k: (0, 0)),
                pl.BlockSpec(gpos.shape, lambda k: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec(h0.shape, lambda k: (0, 0)),
                pl.BlockSpec(pos0.shape, lambda k: (0, 0)),
                # step k emits layer L-1-k's dW block
                pl.BlockSpec((1,) + Wall.shape[1:],
                             lambda k: (n_layers - 1 - k, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(h0.shape, jnp.float32),
                jax.ShapeDtypeStruct(pos0.shape, jnp.float32),
                jax.ShapeDtypeStruct(Wall.shape, jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((n_layers, n, d), jnp.float32),
                pltpu.VMEM((n_layers, n, 3), jnp.float32),
                pltpu.VMEM((n, d), jnp.float32),
                pltpu.VMEM((n, 3), jnp.float32),
            ],
            compiler_params=cp,
            interpret=interpret or _is_cpu(),
        )(send, recv, emask, h0, pos0, Wall, gh, gpos)

    @jax.custom_vjp
    def fused(send, recv, emask, h0, pos0, Wall):
        return _run_fwd(send, recv, emask, h0, pos0, Wall)

    def fwd(send, recv, emask, h0, pos0, Wall):
        out = _run_fwd(send, recv, emask, h0, pos0, Wall)
        return out, (send, recv, emask, h0, pos0, Wall)

    def bwd(res, g):
        send, recv, emask, h0, pos0, Wall = res
        gh, gpos = g
        if pallas_bwd and not (_is_cpu() and not interpret):
            dh0, dpos0, dW = _run_bwd(send, recv, emask, h0, pos0, Wall,
                                      gh, gpos)
        else:
            _, vjp = jax.vjp(
                lambda h_, p_, w_: egnn_stack_xla(
                    send, recv, emask, h_, p_, w_, n_layers, residual),
                h0, pos0, Wall,
            )
            dh0, dpos0, dW = vjp(g)
        return None, None, None, dh0, dpos0, dW

    fused.defvjp(fwd, bwd)
    return fused
