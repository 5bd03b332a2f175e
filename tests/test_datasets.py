"""Dataset generators and the static-shape batching container."""

import numpy as np

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.graph import (
    GraphLoader,
    batch_graphs,
    pad_sizes,
    random_split,
    to_undirected,
)


class TestGenerators:
    def test_star_graphs(self):
        data = ds.create_star_graphs(num=10, fold=[3, 5], dim=3, target="max", seed=0)
        assert len(data) == 10
        for g in data:
            n_spoke = g.num_nodes - 1
            assert n_spoke in (3, 5)
            # spokes unit-normalized after shear (create_graphs.py:62)
            norms = np.linalg.norm(g.pos[1:], axis=1)
            assert np.allclose(norms, 1.0, atol=1e-6)
            # undirected edges: 2*n_spoke directed pairs
            assert g.num_edges == 2 * n_spoke
            # target equals max pairwise spoke angle
            import itertools

            angs = [
                np.arccos(np.clip(np.dot(a, b), -1, 1))
                for a, b in itertools.combinations(g.pos[1:], 2)
            ]
            assert np.isclose(g.y[0], max(angs), atol=1e-5)

    def test_determinism(self):
        a = ds.create_paired_star_graphs(num=4, fold=[5], n_pairs=2, seed=3)
        b = ds.create_paired_star_graphs(num=4, fold=[5], n_pairs=2, seed=3)
        for ga, gb in zip(a, b):
            assert np.allclose(ga.pos, gb.pos) and np.allclose(ga.y, gb.y)

    def test_paired_star2(self):
        data = ds.create_paired_star_graphs_with_two_centers(
            num=3, fold=[6], n_pairs=2, seed=1
        )
        for g in data:
            assert g.y.shape == (4,)
            assert g.num_nodes == 8  # 6 spokes + 2 centers
            assert g.atoms[0] == 0 and g.atoms[-1] == 0

    def test_complete(self):
        data = ds.create_paired_complete_graphs(num=2, n_nodes=[6], n_pairs=2, seed=0)
        for g in data:
            assert g.num_edges == 6 * 5  # undirected complete graph

    def test_kchains(self):
        data = ds.create_kchains(4)
        assert len(data) == 2
        assert data[0].num_nodes == 6
        assert int(data[0].y) == 0 and int(data[1].y) == 1
        # centered
        assert np.allclose(data[0].pos.mean(0), 0, atol=1e-5)

    def test_rotsym(self):
        data = ds.create_rotsym_envs(fold=5)
        # env1 is a rotated copy of env0 — same distance multiset
        d0 = np.linalg.norm(data[0].pos[1:], axis=1)
        d1 = np.linalg.norm(data[1].pos[1:], axis=1)
        assert np.allclose(sorted(d0), sorted(d1), atol=1e-6)

    def test_incompleteness_envs(self):
        for fn in (
            ds.create_two_body_envs,
            ds.create_three_body_envs,
            ds.create_four_body_nonchiral_envs,
            ds.create_four_body_chiral_envs,
        ):
            data = fn()
            assert len(data) == 2
            # distance multisets from the center are degenerate by design
            d0 = sorted(np.linalg.norm(data[0].pos[1:] - data[0].pos[0], axis=1))
            d1 = sorted(np.linalg.norm(data[1].pos[1:] - data[1].pos[0], axis=1))
            assert np.allclose(d0, d1, atol=1e-5)

    def test_invariant_dataset(self):
        data = ds.generate_invariant_dataset(num=4, fold=3, dim=3, seed=0)
        ys = [float(g.y[0]) for g in data]
        assert np.allclose(ys, ys[0])
        d0 = sorted(np.linalg.norm(data[0].pos, axis=1))
        d2 = sorted(np.linalg.norm(data[2].pos, axis=1))
        assert np.allclose(d0, d2, atol=1e-5)


class TestBatching:
    def test_to_undirected(self):
        ei = np.array([[0, 0], [1, 2]])
        out = to_undirected(ei)
        assert out.shape == (2, 4)
        pairs = set(map(tuple, out.T.tolist()))
        assert pairs == {(0, 1), (0, 2), (1, 0), (2, 0)}

    def test_batch_padding(self):
        graphs = ds.create_star_graphs(num=5, fold=[3, 4], seed=0)
        n_pad, e_pad, g_pad = pad_sizes(graphs, 3)
        b = batch_graphs(graphs[:3], n_pad, e_pad, g_pad)
        assert b.num_nodes == n_pad and b.num_graphs == g_pad
        nm = np.asarray(b.node_mask)
        assert nm.sum() == sum(g.num_nodes for g in graphs[:3])
        # pad edges self-loop on the pad node
        em = np.asarray(b.edge_mask)
        s = np.asarray(b.senders)
        assert (s[~em] == n_pad - 1).all()
        # first_node points at each graph's node 0
        fn = np.asarray(b.first_node)
        assert fn[0] == 0 and fn[1] == graphs[0].num_nodes

    def test_loader_epoch(self):
        graphs = ds.create_star_graphs(num=7, fold=[3], seed=0)
        loader = GraphLoader(graphs, batch_size=3, shuffle=True, seed=0)
        batches = list(loader)
        assert len(batches) == 3
        total = sum(int(np.asarray(b.graph_mask).sum()) for b in batches)
        assert total == 7
        # static shapes across batches
        shapes = {(b.num_nodes, b.num_edges, b.num_graphs) for b in batches}
        assert len(shapes) == 1

    def test_random_split(self):
        data = list(range(100))
        tr, va, te = random_split(data, [0.5, 0.2, 0.3], seed=0)
        assert len(tr) == 50 and len(va) == 20 and len(te) == 30
        assert sorted(tr + va + te) == data
