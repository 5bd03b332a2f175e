"""Native C++ batcher vs the pure-Python batcher: bit-identical batches."""

import numpy as np
import pytest

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.graph import GraphLoader, batch_graphs, pad_sizes
from geometric_message_passing_tpu.native import fast_build_batches, have_native
from geometric_message_passing_tpu.native.batch import FlatDataset


@pytest.mark.skipif(not have_native(), reason="no C++ toolchain")
def test_native_matches_python():
    graphs = ds.create_paired_star_graphs(num=13, fold=[5, 6], n_pairs=2, seed=1)
    batch_size = 4
    n_pad, e_pad, g_pad = pad_sizes(graphs, batch_size)
    order = np.random.default_rng(0).permutation(len(graphs))

    flat = FlatDataset(graphs)
    out = fast_build_batches(flat, order, batch_size, n_pad, e_pad, g_pad)
    assert out is not None

    for b in range((len(order) + batch_size - 1) // batch_size):
        chunk = [graphs[i] for i in order[b * batch_size : (b + 1) * batch_size]]
        ref = batch_graphs(chunk, n_pad, e_pad, g_pad)
        assert np.array_equal(out["atoms"][b], np.asarray(ref.atoms))
        assert np.array_equal(out["pos"][b], np.asarray(ref.pos))
        assert np.array_equal(out["senders"][b], np.asarray(ref.senders))
        assert np.array_equal(out["receivers"][b], np.asarray(ref.receivers))
        assert np.array_equal(out["graph_id"][b], np.asarray(ref.graph_id))
        assert np.allclose(out["y"][b], np.asarray(ref.y))
        assert np.array_equal(out["node_mask"][b].astype(bool),
                              np.asarray(ref.node_mask))
        assert np.array_equal(out["edge_mask"][b].astype(bool),
                              np.asarray(ref.edge_mask))
        assert np.array_equal(out["graph_mask"][b].astype(bool),
                              np.asarray(ref.graph_mask))
        assert np.array_equal(out["first_node"][b], np.asarray(ref.first_node))


@pytest.mark.skipif(not have_native(), reason="no C++ toolchain")
def test_stage_epochs_fast_path():
    graphs = ds.create_star_graphs(num=10, fold=[4], seed=0)
    loader = GraphLoader(graphs, batch_size=4, shuffle=True, seed=0)
    staged = loader.stage_epochs(3)
    assert staged is not None
    assert staged.atoms.shape[:2] == (3, 3)  # 3 epochs x 3 steps
    assert staged.node_mask.dtype == bool


def test_native_triplets_match_python():
    """C++ triplet/quad enumeration (native/triplets.cpp) must be
    element-exact with the Python twin, including in-edge (src-sorted,
    stable) ordering, on random multi-degree graphs."""
    import numpy as np

    from geometric_message_passing_tpu.native.batch import fast_build_triplets
    from geometric_message_passing_tpu.native.build import have_native
    from geometric_message_passing_tpu.triplets import _build_triplets_py

    if not have_native():
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(0)
    for trial in range(5):
        n = int(rng.integers(4, 30))
        e = int(rng.integers(n, 5 * n))
        ei = rng.integers(0, n, size=(2, e)).astype(np.int32)
        for wq in (False, True):
            ref = _build_triplets_py(ei, n, wq)
            out = fast_build_triplets(ei, n, wq)
            assert out is not None
            assert len(out) == len(ref)
            for a, b in zip(out, ref):
                np.testing.assert_array_equal(a, b)


def test_native_radius_graph_matches_python():
    """C++ cell-list radius graph == the numpy twin, ELEMENT-EXACT (same
    bucket/offset enumeration order), across dims/batch/loop/knn caps."""
    from geometric_message_passing_tpu.native import have_native
    from geometric_message_passing_tpu.ops.radius_graph import (
        _radius_graph_native, radius_graph_python)

    if not have_native():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    for seed, (n, d, r, use_batch, loop, k) in enumerate([
        (40, 3, 0.7, False, False, None),
        (60, 3, 0.5, True, False, None),
        (50, 2, 0.6, True, True, None),
        (80, 3, 0.9, True, False, 4),
        (1, 3, 0.5, False, True, None),
        (0, 3, 0.5, False, False, None),
    ]):
        pos = rng.random((n, d))
        batch = (np.sort(rng.integers(0, 3, n)) if use_batch else None)
        nat = _radius_graph_native(pos, r, batch, loop, k)
        py = radius_graph_python(pos, r, batch, loop, k)
        assert nat is not None
        np.testing.assert_array_equal(nat, py, err_msg=f"case {seed}")
        assert nat.dtype == py.dtype == np.int32
