"""Behavioral contract of the 101 teaching progression (models/gnn101.py):
the geometric_gnn_101.ipynb cells 29/56/81 unit tests, including the
DESIGNED FAILURE — CoordMPNN is not rotation invariant."""

import jax
import numpy as np
import pytest
from scipy.stats import special_ortho_group

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.graph import GraphLoader
from geometric_message_passing_tpu.models.gnn101 import (
    CoordMPNNModel, EquivariantMPNNLayer, FinalMPNNModel, InvariantMPNNModel)


def _batch(rotate=None, translate=None, permute=False):
    graphs = ds.create_star_graphs(num=3, fold=[4, 5], dim=3, seed=0)
    if rotate is not None or translate is not None:
        R = rotate if rotate is not None else np.eye(3)
        t = translate if translate is not None else np.zeros(3)
        for g in graphs:
            g.pos = (g.pos @ R.T + t).astype(np.float32)
    if permute:
        rng = np.random.default_rng(0)
        for g in graphs:
            perm = rng.permutation(g.num_nodes)
            inv = np.argsort(perm)
            g.atoms = g.atoms[perm]
            g.pos = g.pos[perm]
            g.edge_index = inv[g.edge_index]
    return next(iter(GraphLoader(graphs, batch_size=3)))


MODELS = {
    "coord": CoordMPNNModel,
    "invariant": InvariantMPNNModel,
    "final": FinalMPNNModel,
}


def _run(cls, batch, params=None):
    model = cls(num_layers=2, emb_dim=16, in_dim=2, edge_dim=4, out_dim=2)
    if params is None:
        params = model.init(jax.random.PRNGKey(0), batch)
    return model.apply(params, batch), params


@pytest.mark.parametrize("name", list(MODELS))
def test_permutation_invariance(name):
    out1, params = _run(MODELS[name], _batch())
    out2, _ = _run(MODELS[name], _batch(permute=True), params)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_coord_mpnn_fails_rotation_invariance():
    """The lesson of cell 56: raw-coordinate conditioning breaks under O(3)."""
    R = special_ortho_group.rvs(3, random_state=1)
    out1, params = _run(CoordMPNNModel, _batch())
    out2, _ = _run(CoordMPNNModel, _batch(rotate=R), params)
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


@pytest.mark.parametrize("name", ["invariant", "final"])
def test_rotation_translation_invariance(name):
    R = special_ortho_group.rvs(3, random_state=1)
    t = np.asarray([0.3, -1.2, 0.7])
    out1, params = _run(MODELS[name], _batch())
    out2, _ = _run(MODELS[name], _batch(rotate=R, translate=t), params)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_equivariant_layer_positions_rotate():
    """Cell 81: the equivariant layer's position output transforms with the
    input frame while h stays invariant."""
    import jax.numpy as jnp

    R = special_ortho_group.rvs(3, random_state=2)
    batch = _batch()
    batch_r = _batch(rotate=R)
    layer = EquivariantMPNNLayer(emb_dim=16)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(batch.pos.shape[0], 16)), jnp.float32)
    ea = jnp.zeros((batch.senders.shape[0], 4), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), h, batch.pos, batch.senders,
                        batch.receivers, ea, batch.edge_mask)
    h1, p1 = layer.apply(params, h, batch.pos, batch.senders, batch.receivers,
                         ea, batch.edge_mask)
    h2, p2 = layer.apply(params, h, batch_r.pos, batch_r.senders,
                         batch_r.receivers, ea, batch_r.edge_mask)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p1) @ np.asarray(R, np.float32).T, np.asarray(p2),
        atol=1e-4)
