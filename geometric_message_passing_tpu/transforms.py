"""Graph transforms — equivalents of the teaching-notebook utilities
(geometric_gnn_101.ipynb cell 5: ``CompleteGraph`` and ``SetTarget``) plus
the rotation/permutation probes used by its unit tests (cells 29/56/81)."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .graph import Graph


def complete_graph(g: Graph) -> Graph:
    """Replace edge_index with the full directed complete graph (no self
    loops) — the ``CompleteGraph`` transform."""
    n = g.num_nodes
    row = np.repeat(np.arange(n), n)
    col = np.tile(np.arange(n), n)
    keep = row != col
    ei = np.stack([row[keep], col[keep]]).astype(np.int32)
    return Graph(g.atoms, ei, g.pos, g.y)


def set_target(g: Graph, index: int) -> Graph:
    """Select one regression target column (the ``SetTarget`` transform)."""
    y = np.atleast_1d(np.asarray(g.y))
    return Graph(g.atoms, g.edge_index, g.pos, y[index : index + 1])


def permute_graph(g: Graph, perm: np.ndarray) -> Graph:
    """Relabel nodes by ``perm`` (notebook cell 29 ``permute_graph``)."""
    inv = np.argsort(perm)
    return Graph(
        np.asarray(g.atoms)[perm],
        inv[np.asarray(g.edge_index)].astype(np.int32),
        np.asarray(g.pos)[perm],
        g.y,
    )


def rotate_graph(g: Graph, R: np.ndarray, t: np.ndarray = None) -> Graph:
    """Apply an orthogonal transform + translation to positions."""
    pos = np.asarray(g.pos) @ np.asarray(R).T
    if t is not None:
        pos = pos + np.asarray(t)
    return Graph(g.atoms, g.edge_index, pos, g.y)


def random_orthogonal_matrix(dim: int = 3, seed: int = 0) -> np.ndarray:
    """scipy ortho_group sample (notebook cell 56)."""
    from scipy.stats import ortho_group

    return ortho_group.rvs(dim, random_state=seed)
