"""Scale-capable Pallas segment-sum over SORTED segment ids (round-4 VERDICT
item 5: a Pallas edge kernel that works at >=100k edges).

The toy-regime kernels (ops/pallas_edge.py) build one-hot matrices against
ALL ``num_segments`` columns — O(E x N) work and VMEM, which is exactly why
they cannot exist at molecular-box scale.  This kernel exploits a property
the box regime gives us for free: with the edge list SORTED by segment id
(receiver), the edges of any 128-segment tile occupy ONE contiguous row
range of the data array.  Each grid step then:

  * streams J consecutive [BE, D] data blocks covering that range
    (the window start is scalar-prefetched; J static blocks of the SAME
    array with shifted index maps solve the arbitrary-offset alignment
    problem — no value-level dynamic slicing, per the Mosaic lessons),
  * forms tiny [BE, 128] one-hots from precomputed LOCAL ids
    (-1 rows vanish: the compare never matches),
  * accumulates ``onehot^T @ data`` on the MXU into the tile's [128, D]
    output block.

Work: O(E x 128) MXU FLOPs instead of XLA's row-serial scatter-add —
measured ~10x faster fwd at 100k/128 (scripts/trial_sorted_segsum.py).
The backward of a segment-sum is a plain gather (cheap in XLA), wired via
custom_vjp.

The plan (permutation to sorted order + per-tile window starts + local ids)
is built once per graph on the host (numpy) — static shapes, reusable every
step.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_edge import _is_cpu

TILE = 128          # segments per grid step (output block rows)
BE = 512            # edge rows per data sub-block


@dataclass(frozen=True)
class SegmentTilePlan:
    """Host-built plan for sorted_segment_sum_pallas.

    perm: [E] int32 — permutation bringing edges to segment-sorted order
          (identity when the graph is already receiver-sorted).
    starts: [n_tiles] int32 — BE-aligned window start (in BE units) of each
          tile's edge range in the SORTED order.
    local: [n_tiles, J*BE] int32 — local segment id (0..TILE-1) of each row
          of the tile's window, -1 for rows outside the tile or masked.
    num_segments, n_tiles, j_blocks: ints.
    """

    perm: np.ndarray
    starts: np.ndarray
    local: np.ndarray
    num_segments: int
    n_tiles: int
    j_blocks: int

    def tree_flatten(self):  # pragma: no cover - convenience only
        raise TypeError("SegmentTilePlan is static host data")


def build_segment_tile_plan(segment_ids, num_segments: int, mask=None,
                            tile: int = TILE, be: int = BE,
                            j_blocks: Optional[int] = None) -> SegmentTilePlan:
    """Build the tile plan for ``segment_ids`` (any order; the plan holds the
    sorting permutation).  ``j_blocks`` (window size in BE units) defaults to
    the smallest J covering the densest tile."""
    seg = np.asarray(segment_ids, np.int64)
    e = seg.shape[0]
    if mask is not None:
        m = np.asarray(mask, bool)
    else:
        m = np.ones(e, bool)
    # masked rows sort to the end (segment id ~ +inf) so they never land in
    # a tile's window
    key = np.where(m, seg, num_segments + tile)
    perm = np.argsort(key, kind="stable").astype(np.int32)
    seg_s = key[perm]
    n_tiles = -(-num_segments // tile)
    # first sorted row of each tile, aligned DOWN to a BE boundary
    tile_first = np.searchsorted(seg_s, np.arange(n_tiles) * tile,
                                 side="left")
    tile_last = np.searchsorted(seg_s, (np.arange(n_tiles) + 1) * tile,
                                side="left")   # exclusive
    starts = (tile_first // be).astype(np.int32)
    if j_blocks is None:
        span = tile_last - starts * be
        j_blocks = max(1, int(-(-(span.max()) // be))) if e else 1
    # guard: a tile denser than the window would silently drop edges
    assert np.all(tile_last - starts * be <= j_blocks * be), (
        "tile window overflow: raise j_blocks")
    local = np.full((n_tiles, j_blocks * be), -1, np.int32)
    row = np.arange(j_blocks * be)
    for t in range(n_tiles):
        w0 = int(starts[t]) * be
        rows = row + w0
        valid = (rows >= tile_first[t]) & (rows < tile_last[t]) & (rows < e)
        rv = rows[valid]
        local[t, valid] = (seg_s[rv] - t * tile).astype(np.int32)
    # pad the sorted data array reach: kernel reads up to
    # (max(starts)+j_blocks)*be rows — build the required padded length
    pad_rows = int(starts.max() if n_tiles else 0) * be + j_blocks * be
    return SegmentTilePlan(
        perm=perm, starts=starts, local=local,
        num_segments=num_segments, n_tiles=n_tiles, j_blocks=j_blocks,
    ), max(pad_rows, e)


def _sorted_kernel(starts_ref, local_ref, *refs, j_blocks: int, tile: int):
    data_refs = refs[:j_blocks]
    out_ref = refs[j_blocks]
    acc = jnp.zeros((tile, out_ref.shape[-1]), jnp.float32)
    lid = local_ref[0]                          # [J, BE]
    for j in range(j_blocks):
        d = data_refs[j][...]                   # [BE, D]
        l = lid[j]                              # [BE]
        onehot = (
            l[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        ).astype(jnp.float32)
        acc += jax.lax.dot_general(
            onehot, d, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[...] = acc.astype(out_ref.dtype)


def _sorted_segsum_raw(data_sorted, plan: SegmentTilePlan, interpret=False):
    e_pad, d = data_sorted.shape
    J = plan.j_blocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.n_tiles,),
        in_specs=[
            pl.BlockSpec((1, J, BE), lambda t, starts: (t, 0, 0)),
        ] + [
            pl.BlockSpec((BE, d),
                         functools.partial(
                             lambda t, starts, jj=0: (starts[t] + jj, 0),
                             jj=j))
            for j in range(J)
        ],
        out_specs=pl.BlockSpec((TILE, d), lambda t, starts: (t, 0)),
    )
    kernel = functools.partial(_sorted_kernel, j_blocks=J, tile=TILE)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_tiles * TILE, d),
                                       data_sorted.dtype),
        interpret=interpret or _is_cpu(),
    )(jnp.asarray(plan.starts),
      jnp.asarray(plan.local).reshape(plan.n_tiles, J, BE),
      *([data_sorted] * J))
    return out[: plan.num_segments]


def make_sorted_segment_sum(plan: SegmentTilePlan, segment_ids, e_pad: int,
                            mask=None, interpret: bool = False):
    """Returns segsum(data) -> [num_segments, D] for a FIXED plan.

    Forward: permute rows to sorted order (one XLA permutation gather — a
    streaming copy, no atomics), pad to the window reach, then the tiled
    Pallas kernel.  Backward: d_data = d_out[segment_ids] * mask — a plain
    gather, no scatter anywhere in either direction.
    """
    perm = jnp.asarray(plan.perm)
    seg = jnp.asarray(segment_ids)
    msk = None if mask is None else jnp.asarray(mask)

    @jax.custom_vjp
    def segsum(data):
        ds = data[perm]
        if e_pad > ds.shape[0]:
            ds = jnp.pad(ds, ((0, e_pad - ds.shape[0]), (0, 0)))
        return _sorted_segsum_raw(ds, plan, interpret=interpret)

    def fwd(data):
        return segsum(data), None

    def bwd(_, g):
        d = g[seg]
        if msk is not None:
            d = jnp.where(msk[:, None], d, 0)
        return (d,)

    segsum.defvjp(fwd, bwd)
    return segsum


def sorted_segment_sum_xla(data, segment_ids, num_segments, mask=None):
    """XLA twin (correctness reference)."""
    from .scatter import segment_sum

    return segment_sum(data, segment_ids, num_segments, mask=mask)
