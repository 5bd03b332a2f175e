"""Pallas TPU kernels for the graph hot path.

Two kernels:

  * ``segment_sum_pallas`` — blocked gather-free segment reduction: each grid
    step turns a block of edges into a one-hot matrix and accumulates
    ``onehot^T @ data`` into the output on the MXU.  This is the TPU-native
    form of torch_scatter's scatter_sum (SURVEY §2.3): no serialized
    scatter-add HLO, deterministic accumulation, MXU-rate throughput.

  * ``egnn_layer_pallas`` — the ENTIRE EGNN message-passing layer (gather ->
    message MLP (+LayerNorm) -> position scaling -> masked segment sum/mean
    -> update MLP) fused into ONE kernel launch: every intermediate lives in
    VMEM, nothing round-trips HBM.  Backward uses jax.custom_vjp with the
    XLA twin (ops are identical math), so training gets the fused forward
    for free.

Both kernels have XLA correctness twins and run under ``interpret=True`` on
CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Blocked one-hot segment sum
# ---------------------------------------------------------------------------


def _segsum_kernel(seg_ref, data_ref, mask_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    seg = seg_ref[...]          # [BE]
    data = data_ref[...]        # [BE, D]
    mask = mask_ref[...]        # [BE]
    n_seg = out_ref.shape[0]
    onehot = (
        seg[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n_seg), 1)
    ).astype(data.dtype)
    onehot = onehot * mask[:, None].astype(data.dtype)
    out_ref[...] += jax.lax.dot_general(
        onehot, data, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_segments", "block_edges",
                                             "interpret"))
def segment_sum_pallas(data, segment_ids, num_segments: int, mask=None,
                       block_edges: int = 1024, interpret: bool = False):
    """Masked segment-sum via blocked one-hot MXU matmuls (2-D data)."""
    e, d = data.shape
    if mask is None:
        mask = jnp.ones((e,), dtype=jnp.bool_)
    # Mosaic tiles 1-D int32 operands at 1024 elements; blocks must align.
    be = max(1024, block_edges)
    # pad E to a multiple of the block (mask padding out)
    pad = (-e) % be
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
        segment_ids = jnp.pad(segment_ids, (0, pad))
        mask = jnp.pad(mask, (0, pad))
    steps = data.shape[0] // be
    return pl.pallas_call(
        _segsum_kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((be,), lambda i: (i,)),
            pl.BlockSpec((be, d), lambda i: (i, 0)),
            pl.BlockSpec((be,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((num_segments, d), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((num_segments, d), data.dtype),
        interpret=interpret or _is_cpu(),
    )(segment_ids, data, mask)


# ---------------------------------------------------------------------------
# Fused EGNN layer
# ---------------------------------------------------------------------------


def _layernorm(x, gamma, beta, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


def _egnn_kernel(
    send_ref, recv_ref, emask_ref,       # [BE] int32 / bool
    h_ref, pos_ref,                       # [N, D], [N, 3]
    w_ref,                                # packed weights [P, D] (see packing)
    msg_acc, pos_acc, cnt_acc,            # outputs [N, D], [N, 3], [N, 1]
    *, dims,
):
    (n, d) = dims
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        msg_acc[...] = jnp.zeros_like(msg_acc)
        pos_acc[...] = jnp.zeros_like(pos_acc)
        cnt_acc[...] = jnp.zeros_like(cnt_acc)

    send = send_ref[...]
    recv = recv_ref[...]
    emask = emask_ref[...].astype(jnp.float32)
    h = h_ref[...]
    pos = pos_ref[...]
    W = w_ref[...]

    # weight packing offsets (rows):
    #  W1 [2d+1, d]; b1,g1,B1 (3 rows); W2 [d, d]; b2,g2,B2 (3 rows)
    #  P1 [d, d]; pb1,pg1,pB1 (3 rows); P2 [d, 1 in col 0] (1 row? packed [d,d] col0)
    r = 0
    W1 = W[r : r + 2 * d + 1]; r += 2 * d + 1
    b1, g1, B1 = W[r], W[r + 1], W[r + 2]; r += 3
    W2 = W[r : r + d]; r += d
    b2, g2, B2 = W[r], W[r + 1], W[r + 2]; r += 3
    P1 = W[r : r + d]; r += d
    pb1, pg1, pB1 = W[r], W[r + 1], W[r + 2]; r += 3
    P2col = W[r]; r += 1        # [d] -> scale = x @ P2col + pb2[0]
    pb2 = W[r, 0]; r += 1

    be = send.shape[0]
    oh_send = (
        send[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    ).astype(jnp.float32)
    oh_recv = (
        recv[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    ).astype(jnp.float32)

    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h_j = mm(oh_send, h)        # [BE, D]
    h_i = mm(oh_recv, h)
    pos_j = mm(oh_send, pos)
    pos_i = mm(oh_recv, pos)
    pos_diff = pos_i - pos_j
    sq = jnp.sum(pos_diff * pos_diff, axis=-1, keepdims=True)
    positive = sq > 1e-24
    dists = jnp.where(positive, jnp.sqrt(jnp.where(positive, sq, 1.0)), 0.0)

    x = jnp.concatenate([h_i, h_j, dists], axis=-1)      # [BE, 2D+1]
    m = jnp.maximum(_layernorm(mm(x, W1) + b1, g1, B1), 0.0)
    msg = jnp.maximum(_layernorm(mm(m, W2) + b2, g2, B2), 0.0)
    p = jnp.maximum(_layernorm(mm(msg, P1) + pb1, pg1, pB1), 0.0)
    scale = jnp.sum(p * P2col[None, :], axis=-1, keepdims=True) + pb2
    pos_msg = pos_diff * scale

    ohT = oh_recv * emask[:, None]
    msg_acc[...] += jax.lax.dot_general(
        ohT, msg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pos_acc[...] += jax.lax.dot_general(
        ohT, pos_msg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cnt_acc[...] += jnp.sum(ohT, axis=0)[:, None]


def _egnn_pallas_raw(send, recv, emask, h, pos, packed_w,
                     block_edges: int = 1024, interpret: bool = False):
    n, d = h.shape
    e = send.shape[0]
    be = max(1024, block_edges)  # 1-D operand tiling alignment (Mosaic)
    pad = (-e) % be
    if pad:
        send = jnp.pad(send, (0, pad))
        recv = jnp.pad(recv, (0, pad))
        emask = jnp.pad(emask, (0, pad))
    steps = send.shape[0] // be
    kernel = functools.partial(_egnn_kernel, dims=(n, d))
    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((be,), lambda i: (i,)),
            pl.BlockSpec((be,), lambda i: (i,)),
            pl.BlockSpec((be,), lambda i: (i,)),
            pl.BlockSpec(h.shape, lambda i: (0, 0)),
            pl.BlockSpec(pos.shape, lambda i: (0, 0)),
            pl.BlockSpec(packed_w.shape, lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((n, d), lambda i: (0, 0)),
            pl.BlockSpec((n, 3), lambda i: (0, 0)),
            pl.BlockSpec((n, 1), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        interpret=interpret or _is_cpu(),
    )(send, recv, emask, h, pos, packed_w)


def pack_egnn_weights(params, d: int):
    """Pack an EGNNLayer's flax params into one [P, D] f32 matrix for the
    kernel (row layout documented in _egnn_kernel)."""
    import numpy as np

    def dense(p):
        return np.asarray(p["kernel"], np.float32), np.asarray(p["bias"], np.float32)

    def ln(p):
        return np.asarray(p["scale"], np.float32), np.asarray(p["bias"], np.float32)

    rows = []
    msg = params["mlp_msg"]
    W1, b1 = dense(msg["Dense_0"]); g1, B1 = ln(msg["LayerNorm_0"])
    W2, b2 = dense(msg["Dense_1"]); g2, B2 = ln(msg["LayerNorm_1"])
    posn = params["mlp_pos"]
    P1, pb1 = dense(posn["Dense_0"]); pg1, pB1 = ln(posn["LayerNorm_0"])
    P2, pb2 = dense(posn["Dense_1"])  # [d, 1], [1]
    import numpy as np

    rows.extend([W1, b1[None], g1[None], B1[None]])
    rows.extend([W2, b2[None], g2[None], B2[None]])
    rows.extend([P1, pb1[None], pg1[None], pB1[None]])
    rows.append(P2[:, 0][None])
    pb2_row = np.zeros((1, d), np.float32)
    pb2_row[0, 0] = pb2[0]
    rows.append(pb2_row)
    return jnp.asarray(np.concatenate(rows, axis=0))


def egnn_message_xla(send, recv, emask, h, pos, packed_w, d: int):
    """XLA twin of the fused kernel (identical math, used for the backward
    pass and as the correctness reference)."""
    W = packed_w
    r = 0
    W1 = W[r : r + 2 * d + 1]; r += 2 * d + 1
    b1, g1, B1 = W[r], W[r + 1], W[r + 2]; r += 3
    W2 = W[r : r + d]; r += d
    b2, g2, B2 = W[r], W[r + 1], W[r + 2]; r += 3
    P1 = W[r : r + d]; r += d
    pb1, pg1, pB1 = W[r], W[r + 1], W[r + 2]; r += 3
    P2col = W[r]; r += 1
    pb2 = W[r, 0]

    h_j, h_i = h[send], h[recv]
    pos_j, pos_i = pos[send], pos[recv]
    pos_diff = pos_i - pos_j
    sq = jnp.sum(pos_diff * pos_diff, axis=-1, keepdims=True)
    positive = sq > 1e-24
    dists = jnp.where(positive, jnp.sqrt(jnp.where(positive, sq, 1.0)), 0.0)
    x = jnp.concatenate([h_i, h_j, dists], axis=-1)
    m = jnp.maximum(_layernorm(x @ W1 + b1, g1, B1), 0.0)
    msg = jnp.maximum(_layernorm(m @ W2 + b2, g2, B2), 0.0)
    p = jnp.maximum(_layernorm(msg @ P1 + pb1, pg1, pB1), 0.0)
    scale = p @ P2col[:, None] + pb2
    pos_msg = pos_diff * scale

    from .scatter import segment_sum

    n = h.shape[0]
    msg_acc = segment_sum(msg, recv, n, mask=emask)
    pos_acc = segment_sum(pos_msg, recv, n, mask=emask)
    cnt = segment_sum(jnp.ones((send.shape[0], 1), h.dtype), recv, n,
                      mask=emask)
    return msg_acc, pos_acc, cnt


def make_egnn_message_fused(d: int, interpret: bool = False):
    """Fused forward (Pallas) + XLA-twin backward, as a custom_vjp closure."""

    @jax.custom_vjp
    def fused(send, recv, emask, h, pos, packed_w):
        return _egnn_pallas_raw(send, recv, emask, h, pos, packed_w,
                                interpret=interpret)

    def fwd(send, recv, emask, h, pos, packed_w):
        out = _egnn_pallas_raw(send, recv, emask, h, pos, packed_w,
                               interpret=interpret)
        return out, (send, recv, emask, h, pos, packed_w)

    def bwd(res, g):
        send, recv, emask, h, pos, packed_w = res
        _, vjp = jax.vjp(
            lambda h_, pos_, w_: egnn_message_xla(send, recv, emask, h_, pos_,
                                                  w_, d),
            h, pos, packed_w,
        )
        dh, dpos, dw = vjp(g)
        return None, None, None, dh, dpos, dw

    fused.defvjp(fwd, bwd)
    return fused
