"""Host-side triplet/quad index construction for directional message passing.

Replaces the torch_sparse CSR machinery of the reference:
  * PyG ``DimeNetPlusPlus.triplets`` (used at /root/reference/models/dimenet.py:79)
  * ``xyz_to_dat`` index building (/root/reference/models/layers/spherenet_layer.py:511-525,535-546)

Semantics: for each directed edge e=(j->i) (senders=j, receivers=i) and each
incoming edge e'=(k->j) with k != i, emit triplet (idx_i, idx_j, idx_k,
idx_kj=e', idx_ji=e).  For torsion (SphereNet), for each triplet t and each
in-neighbor k_n of j with k_n != i, emit quad (t, k_n).

Indices are structure-only (independent of positions), so they are computed
once per graph, cached, and concatenated with offsets at batch time; geometry
(distances, angles, torsions) is computed in-graph with jnp gathers so it
stays on-device and differentiable.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .graph import Graph, GraphBatch, TripletData


def _in_edges_by_node(edge_index: np.ndarray, num_nodes: int):
    """For each node n: array of (edge_id, source) of edges arriving at n,
    sorted by source (CSR column order, matching torch_sparse)."""
    src, dst = edge_index
    order = np.lexsort((src, dst))  # sort by dst then src
    out = [[] for _ in range(num_nodes)]
    for e in order:
        out[dst[e]].append((int(e), int(src[e])))
    return out


def build_triplets(edge_index: np.ndarray, num_nodes: int,
                   with_quads: bool = False):
    """Return (idx_i, idx_j, idx_k, idx_kj, idx_ji[, q_trip, q_kn]) numpy arrays.

    Dispatches to the native C++ enumerator (native/triplets.cpp) when the
    library is available; the Python loop below is the correctness twin
    (equivalence tested in tests/test_native.py)."""
    from .native.batch import fast_build_triplets

    native = fast_build_triplets(np.asarray(edge_index), num_nodes, with_quads)
    if native is not None:
        return native
    return _build_triplets_py(edge_index, num_nodes, with_quads)


def _build_triplets_py(edge_index: np.ndarray, num_nodes: int,
                       with_quads: bool = False):
    src, dst = edge_index
    in_edges = _in_edges_by_node(edge_index, num_nodes)
    idx_i, idx_j, idx_k, idx_kj, idx_ji = [], [], [], [], []
    q_trip, q_kn = [], []
    for e in range(edge_index.shape[1]):
        j, i = int(src[e]), int(dst[e])
        for (e2, k) in in_edges[j]:
            if k == i:
                continue
            t = len(idx_i)
            idx_i.append(i)
            idx_j.append(j)
            idx_k.append(k)
            idx_kj.append(e2)
            idx_ji.append(e)
            if with_quads:
                for (_, kn) in in_edges[j]:
                    if kn == i:
                        continue
                    q_trip.append(t)
                    q_kn.append(kn)
    tri = tuple(
        np.asarray(a, dtype=np.int32) for a in (idx_i, idx_j, idx_k, idx_kj, idx_ji)
    )
    if with_quads:
        return tri + (np.asarray(q_trip, np.int32), np.asarray(q_kn, np.int32))
    return tri


_TRIPLET_CACHE: dict = {}


def graph_triplets(g: Graph, with_quads: bool):
    key = (id(g), with_quads)
    hit = _TRIPLET_CACHE.get(key)
    if hit is None:
        hit = build_triplets(g.edge_index, g.num_nodes, with_quads)
        _TRIPLET_CACHE[key] = hit
    return hit


def triplet_pad_sizes(graphs: Sequence[Graph], batch_size: int,
                      with_quads: bool = False,
                      multiple: int = 128) -> Tuple[int, int]:
    """Bucket sizes (T_pad, Q_pad) covering any batch_size window."""
    max_t, max_q = 1, 1
    for g in graphs:
        tri = graph_triplets(g, with_quads)
        max_t = max(max_t, len(tri[0]))
        if with_quads:
            max_q = max(max_q, len(tri[5]))
    rup = lambda x: ((x + multiple - 1) // multiple) * multiple
    return rup(batch_size * max_t), rup(batch_size * max_q) if with_quads else 0


def batch_triplets(graphs: Sequence[Graph], n_pad: int, e_pad: int,
                   t_pad: int, q_pad: int, with_quads: bool) -> TripletData:
    """Concatenate per-graph triplet structures with node/edge offsets, pad."""
    arrs = {k: np.full(t_pad, fill, dtype=np.int32) for k, fill in
            (("idx_i", n_pad - 1), ("idx_j", n_pad - 1), ("idx_k", n_pad - 1),
             ("idx_kj", e_pad - 1), ("idx_ji", e_pad - 1))}
    t_mask = np.zeros(t_pad, dtype=bool)
    if with_quads:
        q_trip = np.full(q_pad, t_pad - 1, dtype=np.int32)
        q_kn = np.full(q_pad, n_pad - 1, dtype=np.int32)
        q_mask = np.zeros(q_pad, dtype=bool)
    n_off = e_off = t_off = q_off = 0
    for g in graphs:
        tri = graph_triplets(g, with_quads)
        nt = len(tri[0])
        arrs["idx_i"][t_off : t_off + nt] = tri[0] + n_off
        arrs["idx_j"][t_off : t_off + nt] = tri[1] + n_off
        arrs["idx_k"][t_off : t_off + nt] = tri[2] + n_off
        arrs["idx_kj"][t_off : t_off + nt] = tri[3] + e_off
        arrs["idx_ji"][t_off : t_off + nt] = tri[4] + e_off
        t_mask[t_off : t_off + nt] = True
        if with_quads:
            nq = len(tri[5])
            q_trip[q_off : q_off + nq] = tri[5] + t_off
            q_kn[q_off : q_off + nq] = tri[6] + n_off
            q_mask[q_off : q_off + nq] = True
            q_off += nq
        t_off += nt
        n_off += g.num_nodes
        e_off += g.num_edges
    assert t_off <= t_pad, (t_off, t_pad)
    kw = {k: jnp.asarray(v) for k, v in arrs.items()}
    kw["t_mask"] = jnp.asarray(t_mask)
    if with_quads:
        assert q_off <= q_pad
        kw["q_trip"] = jnp.asarray(q_trip)
        kw["q_kn"] = jnp.asarray(q_kn)
        kw["q_mask"] = jnp.asarray(q_mask)
    return TripletData(**kw)


def attach_triplets(batch: GraphBatch, with_quads: bool = False,
                    t_pad: Optional[int] = None,
                    q_pad: Optional[int] = None) -> GraphBatch:
    """Build triplets for an already-padded batch (host fallback; loaders
    normally pre-attach via per-graph caches)."""
    ei = np.stack([np.asarray(batch.senders), np.asarray(batch.receivers)])
    em = np.asarray(batch.edge_mask)
    # Only real edges participate; pad edges self-loop on the pad node and
    # would otherwise create bogus triplets.
    real = np.where(em)[0]
    sub = ei[:, real]
    tri = build_triplets(sub, batch.num_nodes, with_quads)
    # map edge ids back through `real`
    idx_i, idx_j, idx_k = tri[0], tri[1], tri[2]
    idx_kj, idx_ji = real[tri[3]].astype(np.int32), real[tri[4]].astype(np.int32)
    nt = len(idx_i)
    t_pad = t_pad or max(_round_up(nt + 1, 128), 128)
    data = dict(
        idx_i=_pad_i(idx_i, t_pad, batch.num_nodes - 1),
        idx_j=_pad_i(idx_j, t_pad, batch.num_nodes - 1),
        idx_k=_pad_i(idx_k, t_pad, batch.num_nodes - 1),
        idx_kj=_pad_i(idx_kj, t_pad, batch.num_edges - 1),
        idx_ji=_pad_i(idx_ji, t_pad, batch.num_edges - 1),
        t_mask=jnp.asarray(np.arange(t_pad) < nt),
    )
    if with_quads:
        q_trip, q_kn = tri[5], tri[6]
        nq = len(q_trip)
        q_pad = q_pad or max(_round_up(nq + 1, 128), 128)
        data["q_trip"] = _pad_i(q_trip, q_pad, t_pad - 1)
        data["q_kn"] = _pad_i(q_kn, q_pad, batch.num_nodes - 1)
        data["q_mask"] = jnp.asarray(np.arange(q_pad) < nq)
    return batch.replace(triplets=TripletData(**data))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_i(a: np.ndarray, size: int, fill: int):
    out = np.full(size, fill, dtype=np.int32)
    out[: len(a)] = a
    return jnp.asarray(out)
