"""Radius-graph construction (host-side, numpy cell list).

The reference installs ``torch_cluster`` (README.md:58) but never exercises
it — every experiment supplies an explicit edge_index, and PyG SchNet's
internal radius interaction graph is bypassed (schnet.py:47).  This module
completes the inventory row (SURVEY §2.3) with a TPU-appropriate design:
edges are built ON HOST at data-preparation time (graph construction is
inherently dynamic-shape, so it belongs outside jit), padded to static
buckets by the existing GraphBatch machinery.

The cell-list algorithm is O(n) for bounded density (vs the naive O(n²)
pairwise check), matching torch_cluster.radius_graph semantics:
directed edges (i, j), i != j, ||pos_i - pos_j|| <= r, optional
max_num_neighbors per node, optional per-node batch vector to forbid
cross-graph edges.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def radius_graph(
    pos: np.ndarray,
    r: float,
    batch: Optional[np.ndarray] = None,
    loop: bool = False,
    max_num_neighbors: Optional[int] = None,
) -> np.ndarray:
    """Return edge_index [2, E] with receivers row 0 / senders row 1 ordered
    like torch_cluster (edge (i, j) means j is a neighbor of i).

    pos: [n, d] float positions.  batch: [n] int graph ids (no cross-graph
    edges).  max_num_neighbors: keep the nearest k neighbors per node.

    Dispatches to the native C++ cell-list builder (native/radius.cpp,
    element-exact vs this Python twin — test_native) when the toolchain is
    available; falls back to the numpy implementation below."""
    out = _radius_graph_native(pos, r, batch, loop, max_num_neighbors)
    if out is not None:
        return out
    return radius_graph_python(pos, r, batch, loop, max_num_neighbors)


def _radius_graph_native(pos, r, batch, loop, max_num_neighbors):
    """ctypes call into gmp_radius_graph; None when the lib is unavailable."""
    from ..native import get_lib

    lib = get_lib()
    if lib is None:
        return None
    import ctypes

    pos = np.ascontiguousarray(np.asarray(pos, np.float64))
    n, d = pos.shape if pos.ndim == 2 else (pos.shape[0], 1)
    if n == 0:
        return np.zeros((2, 0), np.int32)
    fn = lib.gmp_radius_graph
    fn.restype = ctypes.c_long
    b_arr = (np.ascontiguousarray(np.asarray(batch, np.int64))
             if batch is not None else None)
    cap = max(16, 4 * n)
    while True:
        rows = np.empty(cap, np.int32)
        cols = np.empty(cap, np.int32)
        cnt = fn(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_long(n), ctypes.c_long(d), ctypes.c_double(float(r)),
            b_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_long))
            if b_arr is not None else None,
            ctypes.c_int(1 if loop else 0),
            ctypes.c_long(-1 if max_num_neighbors is None
                          else int(max_num_neighbors)),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_long(cap),
        )
        if cnt <= cap:
            return np.stack([rows[:cnt], cols[:cnt]])
        cap = int(cnt)


def radius_graph_python(
    pos: np.ndarray,
    r: float,
    batch: Optional[np.ndarray] = None,
    loop: bool = False,
    max_num_neighbors: Optional[int] = None,
) -> np.ndarray:
    """Pure-numpy twin of the native builder (same candidate enumeration
    order: buckets hold ascending node ids, offsets enumerate last-axis
    fastest — element-exact parity is tested)."""
    pos = np.asarray(pos, np.float64)
    n = pos.shape[0]
    if n == 0:
        return np.zeros((2, 0), np.int32)
    batch = np.zeros(n, np.int64) if batch is None else np.asarray(batch)

    # cell list: hash points into cells of side r; neighbors live in the
    # 3^d adjacent cells
    cell = np.floor(pos / max(r, 1e-12)).astype(np.int64)
    order = np.lexsort(tuple(cell.T) + (batch,))
    from collections import defaultdict

    buckets = defaultdict(list)
    for i in order:
        buckets[(int(batch[i]),) + tuple(cell[i])].append(int(i))

    d = pos.shape[1]
    offsets = np.array(
        np.meshgrid(*([[-1, 0, 1]] * d), indexing="ij")
    ).reshape(d, -1).T

    rows, cols = [], []
    r2 = float(r) * float(r)
    for i in range(n):
        key_base = (int(batch[i]),)
        ci = cell[i]
        cand = []
        for off in offsets:
            cand.extend(buckets.get(key_base + tuple(ci + off), ()))
        cand = np.asarray(cand, np.int64)
        if cand.size == 0:
            continue
        dist2 = np.sum((pos[cand] - pos[i]) ** 2, axis=1)
        keep = dist2 <= r2
        if not loop:
            keep &= cand != i
        cand, dist2 = cand[keep], dist2[keep]
        if max_num_neighbors is not None and cand.size > max_num_neighbors:
            sel = np.argsort(dist2, kind="stable")[:max_num_neighbors]
            cand = cand[sel]
        rows.extend([i] * cand.size)
        cols.extend(cand.tolist())

    return np.stack([
        np.asarray(rows, np.int32), np.asarray(cols, np.int32)
    ]) if rows else np.zeros((2, 0), np.int32)
