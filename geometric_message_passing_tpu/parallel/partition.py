"""Spatial graph partitioning for edge-partitioned (gp) execution.

``build_halo_plan`` (halo.py) block-partitions nodes by INDEX (device p
owns rows [p*n_local, (p+1)*n_local)); for a molecular box that is only a
good partition if spatially-close atoms have close indices.  This module
provides the Morton (Z-order) relabeling that makes it so: quantize
positions to a 3-D grid, interleave the coordinate bits into a Z-order
key, and renumber nodes in key order — contiguous index blocks then map
to compact spatial bricks, so the boundary fraction (and with it the halo
wire bytes) drops to the surface-to-volume ratio instead of ~100%.

The reference has no distributed execution at all (SURVEY §2.5); this is
the standard domain-decomposition recipe of production MD/force-field
codes, expressed as a host-side numpy preprocessing step so the device
program (halo.py) is unchanged.
"""

from __future__ import annotations

import numpy as np

from ..graph import Graph


def morton_key(pos: np.ndarray, bits: int = 10) -> np.ndarray:
    """Z-order key per row of ``pos`` [n, 3]: coordinates quantized to
    ``bits`` bits each (over the bounding box) and bit-interleaved
    (x_i y_i z_i ... x_0 y_0 z_0).  int64 output, 3*bits <= 63."""
    assert 3 * bits <= 63, bits
    p = np.asarray(pos, np.float64)
    lo = p.min(axis=0)
    span = np.maximum(p.max(axis=0) - lo, 1e-12)
    q = np.minimum(((p - lo) / span * (2 ** bits)).astype(np.int64),
                   2 ** bits - 1)
    key = np.zeros(p.shape[0], np.int64)
    for b in range(bits):
        for c in range(3):
            key |= ((q[:, c] >> b) & 1) << (3 * b + (2 - c))
    return key


def morton_permutation(pos: np.ndarray, bits: int = 10) -> np.ndarray:
    """perm[new_index] = old_index, sorted by Morton key (stable)."""
    return np.argsort(morton_key(pos, bits), kind="stable")


def permute_graph_nodes(g: Graph, perm: np.ndarray) -> Graph:
    """Relabel nodes: new node i is old node perm[i].  Edges are relabeled
    accordingly; edge ORDER is preserved (per-edge arrays stay aligned)."""
    perm = np.asarray(perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return Graph(
        atoms=g.atoms[perm],
        edge_index=inv[g.edge_index],
        pos=g.pos[perm],
        y=g.y,
    )


def morton_partition_graph(g: Graph, bits: int = 10) -> Graph:
    """Morton-relabel a graph so index-block partitioning = spatial
    bricks (the gp preprocessing step; compose with ``build_halo_plan``)."""
    return permute_graph_nodes(g, morton_permutation(g.pos, bits))


def partition_stats(senders, receivers, num_nodes: int, k: int,
                    edge_mask=None) -> dict:
    """Interior/boundary accounting of an index-block partition (host):
    fraction of edges whose source is owned by the target's device, and
    the per-device boundary-node counts the halo would move."""
    s = np.asarray(senders)
    r = np.asarray(receivers)
    m = (np.ones_like(s, bool) if edge_mask is None
         else np.asarray(edge_mask, bool))
    n_local = num_nodes // k
    os_, ot = s // n_local, r // n_local
    interior = int(np.sum(m & (os_ == ot)))
    boundary = int(np.sum(m & (os_ != ot)))
    # unique boundary sources per (p, q) pair — what the packed halo ships
    uniq = 0
    for q in range(k):
        on_q = m & (ot == q) & (os_ != q)
        uniq += np.unique(s[on_q]).size
    return {
        "k": k,
        "edges": interior + boundary,
        "interior_edges": interior,
        "boundary_edges": boundary,
        "boundary_fraction": boundary / max(interior + boundary, 1),
        "unique_boundary_sources": uniq,
    }
