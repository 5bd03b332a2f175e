"""Synthetic geometric-graph generators — host-side, numpy.

Re-implements (with identical geometry math and RNG protocol) every dataset
used by the reference:
  * angle-regression stars      /root/reference/experiments/utils/create_graphs.py:10,86,165,256
  * k-chains                    /root/reference/experiments/kchains.ipynb cell 2
  * rotsym environments         /root/reference/experiments/rotsym.ipynb cell 2
  * incompleteness envs         /root/reference/experiments/incompleteness.ipynb cells 3/6/9/12
  * invariant-rotations probe   /root/reference/experiments/equivariant_test.py:15

All geometric randomness in the reference comes from Python's ``random``
module, so seeding here reproduces the reference geometry exactly (float32
round-off aside).  Outputs are ``graph.Graph`` objects (numpy).
"""

from __future__ import annotations

import itertools
import math
import random
from typing import List, Sequence

import numpy as np

from .graph import Graph, to_undirected

__all__ = [
    "create_star_graphs",
    "create_paired_star_graphs",
    "create_paired_star_graphs_with_two_centers",
    "create_paired_complete_graphs",
    "create_kchains",
    "create_rotsym_envs",
    "create_two_body_envs",
    "create_three_body_envs",
    "create_four_body_nonchiral_envs",
    "create_four_body_chiral_envs",
    "generate_invariant_dataset",
    "dataset_registry",
]


def _rot_z(angle: float) -> np.ndarray:
    c, s = math.cos(angle), math.sin(angle)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _rot_y(angle: float) -> np.ndarray:
    c, s = math.cos(angle), math.sin(angle)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def rand_rotation(rng: np.random.Generator) -> np.ndarray:
    """Haar-random rotation matrix (QR of a Gaussian, det fixed to +1)."""
    M = rng.normal(size=(3, 3))
    Q, R = np.linalg.qr(M)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


def _random_spokes(rnd: random.Random, n_spoke: int, dim: int) -> List[np.ndarray]:
    """First spoke at (1,0,0); remaining spokes random on circle/sphere —
    exactly the sampling protocol of create_graphs.py:37-56."""
    pos = [np.array([0.0, 0.0, 0.0]), np.array([1.0, 0.0, 0.0])]
    if dim == 2:
        for _ in range(1, n_spoke):
            a = rnd.uniform(0, 2 * math.pi)
            pos.append(np.array([math.cos(a), math.sin(a), 0.0]))
    else:
        for _ in range(1, n_spoke):
            theta = rnd.uniform(0, 2 * math.pi)
            phi = rnd.uniform(0, math.pi)
            pos.append(
                np.array(
                    [
                        math.sin(phi) * math.cos(theta),
                        math.sin(phi) * math.sin(theta),
                        math.cos(phi),
                    ]
                )
            )
    return pos


def _shear_and_normalize(rnd: random.Random, pos: List[np.ndarray],
                         keep_tail: int = 0) -> List[np.ndarray]:
    """Random shear toward the average vector, then unit-normalize spokes
    (create_graphs.py:59-62). ``keep_tail`` positions at the end are excluded
    from the shear (the second center in paired_star2, create_graphs.py:226)."""
    avg = sum(pos)
    alpha = rnd.uniform(-1, 2)
    if keep_tail:
        body = [p + alpha * avg for p in pos[1:-keep_tail]]
        return pos[:1] + [v / np.linalg.norm(v) for v in body] + pos[-keep_tail:]
    body = [p + alpha * avg for p in pos[1:]]
    return pos[:1] + [v / np.linalg.norm(v) for v in body]


def _angle(v1: np.ndarray, v2: np.ndarray) -> float:
    return math.acos(
        float(np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2)))
    )


def _star_edges(n_spoke: int) -> np.ndarray:
    return np.array([[0] * n_spoke, list(range(1, n_spoke + 1))], dtype=np.int32)


def create_star_graphs(num=5, fold=(3,), dim=3, target="max", seed=0) -> List[Graph]:
    """Star graphs; target = max or mean pairwise spoke angle
    (create_graphs.py:10-82)."""
    assert dim in (2, 3)
    assert target in ("max", "mean")
    rnd = random.Random(seed)
    dataset = []
    for _ in range(num):
        n_spoke = rnd.choice(list(fold))
        atoms = np.zeros(1 + n_spoke, dtype=np.int32)
        edge_index = _star_edges(n_spoke)
        pos = _shear_and_normalize(rnd, _random_spokes(rnd, n_spoke, dim))
        angles = [_angle(v1, v2) for v1, v2 in itertools.combinations(pos[1:], 2)]
        y = np.array([max(angles) if target == "max" else sum(angles) / len(angles)],
                     dtype=np.float32)
        dataset.append(Graph(atoms, to_undirected(edge_index), np.stack(pos), y))
    return dataset


def _pair_atoms(n_pairs: int, n_rest: int) -> List[int]:
    labels = [0]
    for i in range(n_pairs):
        labels += [i + 1] * 2
    labels += [n_pairs + 1] * n_rest
    return labels


def create_paired_star_graphs(num=5, fold=(5,), dim=3, n_pairs=2, seed=0) -> List[Graph]:
    """Stars with labeled node pairs; per-pair center angles as targets
    (create_graphs.py:86-161)."""
    assert dim in (2, 3)
    assert n_pairs * 2 <= min(fold)
    rnd = random.Random(seed)
    dataset = []
    for _ in range(num):
        n_spoke = rnd.choice(list(fold))
        atoms = np.array(_pair_atoms(n_pairs, n_spoke - 2 * n_pairs), dtype=np.int32)
        edge_index = _star_edges(n_spoke)
        pos = _shear_and_normalize(rnd, _random_spokes(rnd, n_spoke, dim))
        spokes = pos[1 : 2 * n_pairs + 1]
        y = np.array(
            [_angle(spokes[2 * j], spokes[2 * j + 1]) for j in range(n_pairs)],
            dtype=np.float32,
        )
        dataset.append(Graph(atoms, to_undirected(edge_index), np.stack(pos), y))
    return dataset


def create_paired_star_graphs_with_two_centers(
    num=5, fold=(5,), dim=3, n_pairs=2, seed=0
) -> List[Graph]:
    """Two hub nodes each connected to all spokes; 2*n_pairs angle targets
    (create_graphs.py:165-252)."""
    assert dim in (2, 3)
    assert n_pairs * 2 <= min(fold)
    rnd = random.Random(seed)
    dataset = []
    for _ in range(num):
        n_spoke = rnd.choice(list(fold))
        atoms = np.array(
            _pair_atoms(n_pairs, n_spoke - 2 * n_pairs) + [0], dtype=np.int32
        )
        edges1 = [0] * n_spoke + [n_spoke + 1] * n_spoke
        edges2 = list(range(1, n_spoke + 1)) * 2
        edge_index = np.array([edges1, edges2], dtype=np.int32)
        # n_spoke random points; the LAST becomes the second center
        pos = _random_spokes(rnd, n_spoke + 1, dim)
        pos = _shear_and_normalize(rnd, pos, keep_tail=1)
        spokes = pos[1 : 2 * n_pairs + 1]
        y1 = [_angle(spokes[2 * j], spokes[2 * j + 1]) for j in range(n_pairs)]
        c2 = pos[-1]
        y2 = [
            _angle(spokes[2 * j] - c2, spokes[2 * j + 1] - c2)
            for j in range(n_pairs)
        ]
        y = np.array(y1 + y2, dtype=np.float32)
        dataset.append(Graph(atoms, to_undirected(edge_index), np.stack(pos), y))
    return dataset


def create_paired_complete_graphs(
    num=5, n_nodes=(6,), dim=3, n_pairs=2, seed=0
) -> List[Graph]:
    """Complete graphs with labeled pairs (create_graphs.py:256-333)."""
    assert dim in (2, 3)
    assert n_pairs * 2 + 1 <= min(n_nodes)
    rnd = random.Random(seed)
    dataset = []
    for _ in range(num):
        n_node = rnd.choice(list(n_nodes))
        atoms = np.array(
            _pair_atoms(n_pairs, n_node - 2 * n_pairs - 1), dtype=np.int32
        )
        edge_index = np.array(
            [
                [i for i in range(n_node) for j in range(i + 1, n_node)],
                [j for i in range(n_node) for j in range(i + 1, n_node)],
            ],
            dtype=np.int32,
        )
        # origin + n_node-1 random points (no fixed first spoke here,
        # create_graphs.py:292-310)
        pos = [np.zeros(3)]
        if dim == 2:
            for _ in range(n_node - 1):
                a = rnd.uniform(0, 2 * math.pi)
                pos.append(np.array([math.cos(a), math.sin(a), 0.0]))
        else:
            for _ in range(n_node - 1):
                theta = rnd.uniform(0, 2 * math.pi)
                phi = rnd.uniform(0, math.pi)
                pos.append(
                    np.array(
                        [
                            math.sin(phi) * math.cos(theta),
                            math.sin(phi) * math.sin(theta),
                            math.cos(phi),
                        ]
                    )
                )
        pos = _shear_and_normalize(rnd, pos)
        spokes = pos[1 : 2 * n_pairs + 1]
        y = np.array(
            [_angle(spokes[2 * j], spokes[2 * j + 1]) for j in range(n_pairs)],
            dtype=np.float32,
        )
        dataset.append(Graph(atoms, to_undirected(edge_index), np.stack(pos), y))
    return dataset


# ---------------------------------------------------------------------------
# Expressivity benchmark environments
# ---------------------------------------------------------------------------


def create_kchains(k: int) -> List[Graph]:
    """Two k-chains differing only at one end; tests long-range propagation /
    oversquashing (kchains.ipynb cell 2)."""
    assert k >= 2
    dataset = []
    for label, head_x in ((0, -4.0), (1, 4.0)):
        n = k + 2
        atoms = np.zeros(n, dtype=np.int32)
        edge_index = np.array(
            [list(range(n - 1)), list(range(1, n))], dtype=np.int32
        )
        pos = np.array(
            [[head_x, -3.0, 0.0]]
            + [[0.0, 5.0 * i, 0.0] for i in range(k)]
            + [[4.0, 5.0 * (k - 1) + 3.0, 0.0]],
            dtype=np.float64,
        )
        pos = pos - pos.mean(axis=0)
        dataset.append(
            Graph(atoms, to_undirected(edge_index), pos, np.array(label, np.int32))
        )
    return dataset


def create_rotsym_envs(fold: int = 3, seed: int = 0) -> List[Graph]:
    """n-fold rotationally symmetric stars; env 1 rotated by q < 2pi/fold
    (rotsym.ipynb cell 2)."""
    rnd = random.Random(seed)
    atoms = np.zeros(1 + fold, dtype=np.int32)
    edge_index = to_undirected(_star_edges(fold))
    x = np.array([1.0, 0.0, 0.0])
    pos = [np.zeros(3), x]
    for count in range(1, fold):
        R = _rot_z(2 * math.pi / fold * count)
        pos.append(x @ R.T)
    pos = np.stack(pos)
    data1 = Graph(atoms, edge_index, pos, np.array(0, np.int32))
    q = 2 * math.pi / (fold + rnd.randint(1, fold))
    assert q < 2 * math.pi / fold
    pos2 = pos @ _rot_z(q).T
    data2 = Graph(atoms, edge_index, pos2, np.array(1, np.int32))
    return [data1, data2]


def _env_pair(pos0, pos1) -> List[Graph]:
    n = len(pos0)
    atoms = np.zeros(n, dtype=np.int32)
    edge_index = to_undirected(
        np.array([[0] * (n - 1), list(range(1, n))], dtype=np.int32)
    )
    return [
        Graph(atoms, edge_index, np.asarray(pos0, np.float64), np.array(0, np.int32)),
        Graph(atoms, edge_index, np.asarray(pos1, np.float64), np.array(1, np.int32)),
    ]


def create_two_body_envs() -> List[Graph]:
    """Distance-degenerate pair (incompleteness.ipynb cell 3)."""
    return _env_pair(
        [[0, 0, 0], [5, 0, 0], [3, 0, 4]],
        [[0, 0, 0], [5, 0, 0], [-5, 0, 0]],
    )


def create_three_body_envs() -> List[Graph]:
    """Distance+angle-degenerate pair (incompleteness.ipynb cell 6)."""
    a = (5, 0, 5)
    b = (5, 5, 5)
    c = (0, 5, 5)
    return _env_pair(
        [[0, 0, 0], list(a), [b[0], b[1], b[2]], [-b[0], -b[1], b[2]], [c[0], c[1], c[2]]],
        [[0, 0, 0], list(a), [b[0], b[1], b[2]], [-b[0], -b[1], b[2]], [c[0], -c[1], c[2]]],
    )


def create_four_body_nonchiral_envs() -> List[Graph]:
    """3-body degenerate, 4-body distinguishable pair (incompleteness.ipynb cell 9)."""
    a1, a2, a3 = (3, 2, -4), (0, 2, 5), (-3, 2, -4)
    b1, b2, b3 = (3, -2, -4), (0, -2, 5), (-3, -2, -4)
    c = (0, 5, 0)
    Q = _rot_y(2 * math.pi / 10)
    rb = [np.asarray(b, float) @ Q for b in (b1, b2, b3)]
    base = [[0, 0, 0], list(a1), list(a2), list(a3)] + [list(v) for v in rb]
    return _env_pair(base + [[c[0], c[1], c[2]]], base + [[c[0], -c[1], c[2]]])


def create_four_body_chiral_envs() -> List[Graph]:
    """Mirror-image environments; needs odd+even parity features
    (incompleteness.ipynb cell 12)."""
    a1, a2, a3 = (3, 0, -4), (0, 0, 5), (-3, 0, -4)
    c = (0, 5, 0)
    base = [[0, 0, 0], list(a1), list(a2), list(a3)]
    return _env_pair(base + [[c[0], c[1], c[2]]], base + [[c[0], -c[1], c[2]]])


def create_true_chiral_envs() -> List[Graph]:
    """A genuinely chiral mirror pair (this framework's addition).

    ANALYSIS NOTE: the reference's four-body "chiral" environments
    (incompleteness.ipynb cell 12) are NOT chiral: the base configuration
    {0, a1, a2, a3, c} is symmetric under x -> -x (a1 <-> a3), so its y-mirror
    equals a rotation R_z(pi) of the original — the two environments are
    rotation-equivalent and indistinguishable by ANY rotation-invariant model
    (verified in tests/test_incompleteness.py). This generator provides a
    scalemic configuration with no internal mirror symmetry, so the pair is
    separable exactly by parity-sensitive (pseudoscalar) features.
    """
    base = [
        [0.0, 0.0, 0.0],
        [2.0, 0.0, 0.0],
        [0.0, 3.0, 0.5],
        [-0.5, 0.0, 4.0],
        [1.0, 1.5, 2.0],
    ]
    mirror = [[x, -y, z] for (x, y, z) in base]
    return _env_pair(base, mirror)


def generate_invariant_dataset(num=5, fold=3, dim=2, target="max", seed=0) -> List[Graph]:
    """One base star + (num-1) randomly rotated copies with a shared label —
    data-level invariance probe (equivariant_test.py:15-93).  Note: like the
    reference, spokes are sheared but NOT re-normalized here."""
    assert dim in (2, 3)
    assert target in ("max", "mean")
    rnd = random.Random(seed)
    nprng = np.random.default_rng(seed)
    atoms = np.zeros(1 + fold, dtype=np.int32)
    edge_index = to_undirected(_star_edges(fold))
    pos = _random_spokes(rnd, fold, dim)
    avg = sum(pos)
    alpha = rnd.uniform(-1, 2)
    pos = pos[:1] + [p + alpha * avg for p in pos[1:]]
    angles = [_angle(v1, v2) for v1, v2 in itertools.combinations(pos[1:], 2)]
    y = np.array([max(angles) if target == "max" else sum(angles) / len(angles)],
                 dtype=np.float32)
    pos = np.stack(pos)
    dataset = [Graph(atoms, edge_index, pos, y)]
    for _ in range(num - 1):
        R = rand_rotation(nprng)
        dataset.append(Graph(atoms, edge_index, pos @ R.T, y))
    return dataset


def create_molecular_boxes(num=1, n_nodes=10_000, cutoff=3.0,
                           avg_degree=14.0, n_species=8, seed=0,
                           max_num_neighbors=None) -> List[Graph]:
    """Large-scale synthetic molecular boxes — the scale-benchmark dataset
    (round 3; no reference counterpart: the reference never exceeds ~30
    nodes/graph).  ``n_nodes`` atoms uniform in a cubic box sized so the
    expected radius-graph degree at ``cutoff`` is ``avg_degree``; edges come
    from ops.radius_graph (the native C++ cell list when built — this is
    the generator that gives the radius-graph builder its product
    consumer).  Target: mean coordination number / 10 (an easy invariant
    regression target; the benchmark measures throughput, not learning).
    """
    from .ops.radius_graph import radius_graph

    density = avg_degree / (4.0 / 3.0 * np.pi * cutoff**3)
    side = (n_nodes / density) ** (1.0 / 3.0)
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        pos = rng.uniform(0.0, side, size=(n_nodes, 3)).astype(np.float32)
        atoms = rng.integers(0, n_species, n_nodes).astype(np.int32)
        edge_index = radius_graph(
            pos, cutoff, max_num_neighbors=max_num_neighbors
        )
        y = np.asarray(
            [edge_index.shape[1] / max(n_nodes, 1) / 10.0], np.float32
        )
        out.append(Graph(atoms, edge_index, pos, y))
    return out


dataset_registry = {
    "star": create_star_graphs,
    "paired_star": create_paired_star_graphs,
    "paired_star2": create_paired_star_graphs_with_two_centers,
    "complete": create_paired_complete_graphs,
    "kchains": create_kchains,
    "rotsym": create_rotsym_envs,
    "two_body": create_two_body_envs,
    "three_body": create_three_body_envs,
    "four_body_nonchiral": create_four_body_nonchiral_envs,
    "four_body_chiral": create_four_body_chiral_envs,
    "true_chiral": create_true_chiral_envs,
    "molecular_box": create_molecular_boxes,
}
