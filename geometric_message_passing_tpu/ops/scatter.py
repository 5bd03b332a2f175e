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


# Accumulator threshold for ``segment_sum_into``: below it the deterministic
# one-hot MXU form is used (toy regime); above it the direct in-place scatter.
# Module-level so trials/tests can force either branch.
_INPLACE_MIN_SEGMENTS = _ONEHOT_MAX_SEGMENTS


def segment_sum_into(acc, data, segment_ids, mask=None):
    """``acc.at[ids].add(masked data)`` — the accumulator form for chunked
    scan bodies (mace_blocks._conv, dimenet/spherenet triplet folds).

    Numerically equivalent to ``acc + segment_sum(data, ids, N, mask)`` up
    to fp summation order, but the direct scatter lets XLA alias the scan
    carry and update it IN PLACE: per-chunk HBM traffic is O(touched rows),
    not O(N) — the ``zeros -> scatter -> read acc -> write acc`` form moved
    the full [N, D] accumulator through HBM ~3x per chunk, which at box
    scale (100k nodes x ~50-160 chunks) was the dominant per-step traffic
    (RESULTS.md round-4 roofline: mace_ff 0.12 / tfn_ff 0.16 of the
    bandwidth roof; round-5 fix).  The accumulator enters the scan body
    LINEARLY, so under remat its value is never saved as a residual —
    the in-place form is safe on both the fwd and the recomputed bwd pass.

    Below ``_INPLACE_MIN_SEGMENTS`` the deterministic one-hot MXU reduction
    is kept (toy regime, where the RMW traffic is irrelevant and bitwise
    reproducibility of the research configs matters)."""
    n = acc.shape[0]
    if (n <= _INPLACE_MIN_SEGMENTS
            and data.ndim >= 2
            and jnp.issubdtype(data.dtype, jnp.floating)):
        return acc + segment_sum(data, segment_ids, n, mask=mask)
    if mask is not None:
        data = jnp.where(_bcast(mask, data), data, 0)
    return acc.at[segment_ids].add(data)


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
