"""Segment reductions — the TPU-native replacement for ``torch_scatter``
(C++/CUDA) used throughout the reference
(egnn_layer.py:77-79, tfn_layer.py:87, spherenet_layer.py:181, blocks.py:261...).

On TPU, gather/scatter lowers to XLA ``gather``/``scatter-add`` HLOs which the
compiler fuses with surrounding elementwise work.  These wrappers fix the
masked-padding semantics once (pad edges contribute zero; empty segments give
0 for sum, 0 for mean — matching torch_scatter's mean-with-empty-segment
behavior of 0, see scatter_mean docs) so models never re-implement them.

A fused Pallas gather->compute->scatter kernel for the hot path lives in
``ops/pallas_edge.py``; these XLA forms are its correctness twins.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Segment-sum strategy: XLA's scatter-add HLO serializes updates on TPU; for
# the graph sizes this framework targets (N up to a few thousand per shard)
# the one-hot matmul formulation runs the reduction on the MXU instead and is
# both faster and exactly deterministic.  Above the threshold we fall back to
# scatter-add.
_ONEHOT_MAX_SEGMENTS = 4096


def _segment_sum_onehot(data, segment_ids, num_segments: int):
    """sum_e onehot[e,s] * data[e,...]  ==  onehot^T @ data  (MXU).

    f32 accumulation with HIGHEST precision: the one-hot factor is exact, so
    the result matches scatter-add bit-for-bit up to summation order.
    """
    onehot = (
        segment_ids[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, num_segments), 1)
    ).astype(data.dtype)
    lead = data.shape[0]
    flat = data.reshape(lead, -1)
    out = jax.lax.dot_general(
        onehot, flat, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).astype(data.dtype)
    return out.reshape((num_segments,) + data.shape[1:])


def segment_sum(data, segment_ids, num_segments: int, mask=None):
    """Sum ``data`` rows into ``num_segments`` buckets. ``mask`` zeroes rows."""
    if mask is not None:
        data = jnp.where(_bcast(mask, data), data, 0)
    if (
        num_segments <= _ONEHOT_MAX_SEGMENTS
        and data.ndim >= 2
        and jnp.issubdtype(data.dtype, jnp.floating)
    ):
        return _segment_sum_onehot(data, segment_ids, num_segments)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int, mask=None):
    """Mean with empty segments mapped to 0 (torch_scatter semantics)."""
    total = segment_sum(data, segment_ids, num_segments, mask)
    ones = jnp.ones(data.shape[:1] + (1,), dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments, mask)[..., 0]
    count = jnp.maximum(count, 1)
    return total / _bcast_seg(count, total)


def segment_max(data, segment_ids, num_segments: int, mask=None):
    """Max with empty segments mapped to 0 (torch_scatter semantics)."""
    neg_inf = jnp.asarray(-jnp.inf, dtype=data.dtype)
    if mask is not None:
        data = jnp.where(_bcast(mask, data), data, neg_inf)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, 0)


def segment_min(data, segment_ids, num_segments: int, mask=None):
    pos_inf = jnp.asarray(jnp.inf, dtype=data.dtype)
    if mask is not None:
        data = jnp.where(_bcast(mask, data), data, pos_inf)
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, 0)


def segment_softmax(logits, segment_ids, num_segments: int, mask=None):
    """Numerically-stable softmax within each segment."""
    mx = segment_max(logits, segment_ids, num_segments, mask)
    logits = logits - mx[segment_ids]
    ex = jnp.exp(logits)
    if mask is not None:
        ex = jnp.where(_bcast(mask, ex), ex, 0)
    denom = segment_sum(ex, segment_ids, num_segments)
    return ex / jnp.maximum(denom[segment_ids], 1e-16)


def _bcast(mask, data):
    return mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))


def _bcast_seg(count, total):
    return count.reshape(count.shape + (1,) * (total.ndim - count.ndim))
