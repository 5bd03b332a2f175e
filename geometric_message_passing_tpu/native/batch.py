"""ctypes wrapper for the native epoch batcher + flattened dataset cache."""

from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .build import get_lib

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


class FlatDataset:
    """Concatenated, C-contiguous view of a list of Graphs (built once)."""

    def __init__(self, graphs: Sequence):
        self.n = len(graphs)
        self.n_nodes = np.asarray([g.num_nodes for g in graphs], np.int32)
        self.n_edges = np.asarray([g.num_edges for g in graphs], np.int32)
        self.node_off = np.zeros(self.n, np.int64)
        self.edge_off = np.zeros(self.n, np.int64)
        np.cumsum(self.n_nodes[:-1], out=self.node_off[1:])
        np.cumsum(self.n_edges[:-1], out=self.edge_off[1:])
        self.atoms = np.ascontiguousarray(
            np.concatenate([g.atoms for g in graphs]), np.int32
        )
        self.pos = np.ascontiguousarray(
            np.concatenate([g.pos for g in graphs]), np.float32
        )
        self.esrc = np.ascontiguousarray(
            np.concatenate([g.edge_index[0] for g in graphs]), np.int32
        )
        self.edst = np.ascontiguousarray(
            np.concatenate([g.edge_index[1] for g in graphs]), np.int32
        )
        ys = [np.atleast_1d(np.asarray(g.y, np.float32)) for g in graphs]
        self.y_dim = int(ys[0].shape[0])
        self.ys = np.ascontiguousarray(np.stack(ys), np.float32)


_SIG_SET = False


def _fn(lib):
    global _SIG_SET
    fn = lib.gmp_build_batches
    if not _SIG_SET:
        fn.restype = None
        fn.argtypes = [
            _I32P, _F32P, _I32P, _I32P, _F32P, ctypes.c_int32,
            _I32P, _I32P, _I64P, _I64P,
            _I32P, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _I32P, _F32P, _I32P, _I32P, _I32P, _F32P, _U8P, _U8P, _U8P, _I32P,
        ]
        _SIG_SET = True
    return fn


_TRI_SIG_SET = False


def _tri_fns(lib):
    global _TRI_SIG_SET
    cnt, fill = lib.gmp_count_triplets, lib.gmp_fill_triplets
    if not _TRI_SIG_SET:
        cnt.restype = None
        cnt.argtypes = [_I32P, _I32P, ctypes.c_int32, ctypes.c_int32,
                        ctypes.c_int32, _I64P]
        fill.restype = None
        fill.argtypes = [_I32P, _I32P, ctypes.c_int32, ctypes.c_int32,
                         ctypes.c_int32,
                         _I32P, _I32P, _I32P, _I32P, _I32P, _I32P, _I32P]
        _TRI_SIG_SET = True
    return cnt, fill


def fast_build_triplets(edge_index: np.ndarray, num_nodes: int,
                        with_quads: bool):
    """Native triplet/quad enumeration (triplets.cpp). Returns the same
    tuple as triplets.build_triplets, or None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    cnt, fill = _tri_fns(lib)
    esrc = np.ascontiguousarray(edge_index[0], np.int32)
    edst = np.ascontiguousarray(edge_index[1], np.int32)
    e = np.int32(esrc.shape[0])
    counts = np.zeros(2, np.int64)
    cnt(esrc, edst, e, np.int32(num_nodes), np.int32(with_quads), counts)
    nt, nq = int(counts[0]), int(counts[1])
    outs = [np.empty(nt, np.int32) for _ in range(5)]
    q_trip = np.empty(nq if with_quads else 0, np.int32)
    q_kn = np.empty(nq if with_quads else 0, np.int32)
    fill(esrc, edst, e, np.int32(num_nodes), np.int32(with_quads),
         *outs, q_trip, q_kn)
    tri = tuple(outs)
    if with_quads:
        return tri + (q_trip, q_kn)
    return tri


def fast_build_batches(flat: FlatDataset, order: np.ndarray, batch_size: int,
                       n_pad: int, e_pad: int, g_pad: int):
    """Build all epoch batches at once. Returns dict of stacked numpy arrays
    with leading dim num_batches, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    order = np.ascontiguousarray(order, np.int32)
    nb = (len(order) + batch_size - 1) // batch_size
    out = {
        "atoms": np.empty((nb, n_pad), np.int32),
        "pos": np.empty((nb, n_pad, 3), np.float32),
        "senders": np.empty((nb, e_pad), np.int32),
        "receivers": np.empty((nb, e_pad), np.int32),
        "graph_id": np.empty((nb, n_pad), np.int32),
        "y": np.empty((nb, g_pad, flat.y_dim), np.float32),
        "node_mask": np.empty((nb, n_pad), np.uint8),
        "edge_mask": np.empty((nb, e_pad), np.uint8),
        "graph_mask": np.empty((nb, g_pad), np.uint8),
        "first_node": np.empty((nb, g_pad), np.int32),
    }
    _fn(lib)(
        flat.atoms, flat.pos, flat.esrc, flat.edst, flat.ys,
        np.int32(flat.y_dim),
        flat.n_nodes, flat.n_edges, flat.node_off, flat.edge_off,
        order, np.int32(len(order)),
        np.int32(batch_size), np.int32(n_pad), np.int32(e_pad), np.int32(g_pad),
        out["atoms"], out["pos"], out["senders"], out["receivers"],
        out["graph_id"], out["y"], out["node_mask"], out["edge_mask"],
        out["graph_mask"], out["first_node"],
    )
    return out
