"""Equivariance / invariance unit tests for the model zoo.

Promotes the reference's notebook test harness
(geometric_gnn_101.ipynb cells 29/56/81: permutation + rot/trans invariance
and equivariance via allclose after random O(3) transforms) to pytest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import ortho_group, special_ortho_group

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.graph import GraphLoader
from geometric_message_passing_tpu.models import model_registry


def make_batch(seed=0, rotate=None, translate=None, permute=False):
    graphs = ds.create_star_graphs(num=3, fold=[4, 5], dim=3, seed=seed)
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
    loader = GraphLoader(graphs, batch_size=3)
    return next(iter(loader))


MODELS = {
    "egnn": dict(num_layers=2, emb_dim=32),
    "schnet": dict(num_layers=2, hidden_channels=32),
    "gvp": dict(num_layers=2, s_dim=32, v_dim=4),
    "tfn": dict(num_layers=2, emb_dim=16, max_ell=2, mlp_dim=32, pool="sum"),
    "mace": dict(num_layers=2, emb_dim=8, max_ell=2, correlation=2, mlp_dim=32),
    "mpnn": dict(num_layers=2, emb_dim=32),
}
if "dimenet" in model_registry:
    MODELS["dimenet"] = dict(num_layers=2, hidden_channels=32,
                             out_emb_channels=32, int_emb_size=16,
                             num_spherical=4, num_radial=4)
if "spherenet" in model_registry:
    MODELS["spherenet"] = dict(num_layers=2, hidden_channels=32,
                               out_emb_channels=32, int_emb_size=16,
                               num_spherical=4, num_radial=4)


def run_model(name, kwargs, batch, params=None):
    model = model_registry[name](in_dim=1, out_dim=2, **kwargs)
    needs_triplets = name in ("dimenet", "spherenet")
    if needs_triplets:
        from geometric_message_passing_tpu.triplets import attach_triplets

        batch = attach_triplets(batch, with_quads=(name == "spherenet"))
    if params is None:
        variables = model.init(jax.random.PRNGKey(0), batch)
        return model, variables, np.asarray(model.apply(variables, batch))
    return model, params, np.asarray(model.apply(params, batch))


@pytest.mark.parametrize("name", sorted(MODELS))
def test_rotation_translation_invariance(name):
    """Invariant prediction head: output unchanged under global roto-translation
    (geometric_gnn_101.ipynb cell 56)."""
    kwargs = MODELS[name]
    batch = make_batch()
    model, variables, out0 = run_model(name, kwargs, batch)
    R = special_ortho_group.rvs(3, random_state=1)
    t = np.array([1.5, -2.0, 0.5])
    batch_rt = make_batch(rotate=R, translate=t)
    if name in ("dimenet", "spherenet"):
        from geometric_message_passing_tpu.triplets import attach_triplets

        batch_rt = attach_triplets(batch_rt, with_quads=(name == "spherenet"))
    out1 = np.asarray(model.apply(variables, batch_rt))
    mask = np.asarray(batch.graph_mask)
    assert np.allclose(out0[mask], out1[mask], atol=1e-3), (
        np.abs(out0[mask] - out1[mask]).max()
    )


@pytest.mark.parametrize("name", sorted(set(MODELS) - {"spherenet"}))
def test_reflection_invariance_of_invariant_models(name):
    """Distance/angle-based models are O(3) invariant; vector/tensor models
    with invariant heads are too (scalar readout).  SphereNet is excluded:
    its torsion channel is chirality-sensitive by design (signed dihedral,
    spherenet_layer.py:556-559)."""
    kwargs = MODELS[name]
    batch = make_batch()
    model, variables, out0 = run_model(name, kwargs, batch)
    Q = -np.eye(3)  # inversion
    batch_m = make_batch(rotate=Q)
    if name in ("dimenet", "spherenet"):
        from geometric_message_passing_tpu.triplets import attach_triplets

        batch_m = attach_triplets(batch_m, with_quads=(name == "spherenet"))
    out1 = np.asarray(model.apply(variables, batch_m))
    mask = np.asarray(batch.graph_mask)
    assert np.allclose(out0[mask], out1[mask], atol=1e-3)


@pytest.mark.parametrize("name", sorted(MODELS))
def test_permutation_invariance(name):
    """Node relabeling must not change graph-level output
    (geometric_gnn_101.ipynb cell 29)."""
    kwargs = dict(MODELS[name])
    if name not in ("dimenet", "spherenet"):
        kwargs["pool"] = "sum"  # first-node pooling is permutation-sensitive by design
    batch = make_batch()
    model, variables, out0 = run_model(name, kwargs, batch)
    batch_p = make_batch(permute=True)
    if name in ("dimenet", "spherenet"):
        from geometric_message_passing_tpu.triplets import attach_triplets

        batch_p = attach_triplets(batch_p, with_quads=(name == "spherenet"))
    out1 = np.asarray(model.apply(variables, batch_p))
    mask = np.asarray(batch.graph_mask)
    assert np.allclose(out0[mask], out1[mask], atol=1e-3)


def test_egnn_equivariant_positions():
    """EGNN's position channel transforms with the rotation
    (geometric_gnn_101.ipynb cell 81 analog, via equivariant_pred output)."""
    from geometric_message_passing_tpu.models import EGNNModel

    batch = make_batch()
    model = EGNNModel(num_layers=2, emb_dim=16, in_dim=1, out_dim=1,
                      equivariant_pred=True)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out0 = np.asarray(model.apply(variables, batch))
    R = special_ortho_group.rvs(3, random_state=2)
    batch_r = make_batch(rotate=R)
    out1 = np.asarray(model.apply(variables, batch_r))
    # equivariant head consumes [h, pos]: outputs differ under rotation
    mask = np.asarray(batch.graph_mask)
    assert not np.allclose(out0[mask], out1[mask], atol=1e-4)


def test_tfn_equivariant_features():
    """TFN hidden l=1 features rotate with the input (per-layer equivariance)."""
    from geometric_message_passing_tpu import irreps as irr
    from geometric_message_passing_tpu.irreps import Irreps
    from geometric_message_passing_tpu.nn.conv import TensorProductConvLayer
    from geometric_message_passing_tpu.ops.radial import radial_embedding
    from geometric_message_passing_tpu.ops.spherical import spherical_harmonics

    batch = make_batch()
    R = special_ortho_group.rvs(3, random_state=3)
    batch_r = make_batch(rotate=R)

    hidden = Irreps("8x0e+8x1o+8x2e")
    layer = TensorProductConvLayer(
        in_irreps=Irreps("8x0e"), out_irreps=hidden,
        sh_irreps=Irreps.spherical_harmonics(2), mlp_dim=16, gate=False,
    )

    def forward(b):
        h = jnp.ones((b.num_nodes, 8))
        vec = b.pos[b.senders] - b.pos[b.receivers]
        lengths = jnp.linalg.norm(vec, axis=-1, keepdims=True)
        sh = spherical_harmonics(vec, 2)
        ef = radial_embedding(lengths, 10.0)
        return h, b.senders, b.receivers, sh, ef

    args = forward(batch)
    variables = layer.init(jax.random.PRNGKey(0), *args,
                           edge_mask=batch.edge_mask)
    out0 = np.asarray(layer.apply(variables, *args, edge_mask=batch.edge_mask))
    args_r = forward(batch_r)
    out1 = np.asarray(layer.apply(variables, *args_r, edge_mask=batch_r.edge_mask))
    D = irr.irreps_rep(hidden, R, 1.0)
    nm = np.asarray(batch.node_mask)
    assert np.allclose(out1[nm], out0[nm] @ D.T, atol=1e-3), (
        np.abs(out1[nm] - out0[nm] @ D.T).max()
    )


def test_gvp_autoregressive_and_node_mask_modes():
    """GVPConvLayer decoder modes (gvp_layer.py:386-437):
    - autoregressive_x == x must reproduce the plain mean-aggregated path
      exactly (add-aggregation over fwd+bwd edge splits / total degree),
    - node_mask freezes unmasked nodes."""
    from geometric_message_passing_tpu.models.gvpgnn import GVPConvLayer

    batch = make_batch(seed=3)
    rng = np.random.default_rng(7)
    n = batch.pos.shape[0]
    e = batch.senders.shape[0]
    node_dims, edge_dims = (16, 4), (8, 1)
    s = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, 4, 3)).astype(np.float32))
    es = jnp.asarray(rng.normal(size=(e, 8)).astype(np.float32))
    ev = jnp.asarray(rng.normal(size=(e, 1, 3)).astype(np.float32))

    layer = GVPConvLayer(node_dims, edge_dims)
    variables = layer.init(jax.random.PRNGKey(0), (s, v), batch.senders,
                           batch.receivers, (es, ev), batch.edge_mask)
    plain = layer.apply(variables, (s, v), batch.senders, batch.receivers,
                        (es, ev), batch.edge_mask)
    auto = layer.apply(variables, (s, v), batch.senders, batch.receivers,
                       (es, ev), batch.edge_mask,
                       autoregressive_x=(s, v))
    np.testing.assert_allclose(np.asarray(auto[0]), np.asarray(plain[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(auto[1]), np.asarray(plain[1]),
                               atol=2e-5)

    # distinct autoregressive embeddings change the result
    other = layer.apply(variables, (s, v), batch.senders, batch.receivers,
                        (es, ev), batch.edge_mask,
                        autoregressive_x=(s * 2.0, v * 0.5))
    assert not np.allclose(np.asarray(other[0]), np.asarray(plain[0]),
                           atol=1e-3)

    node_mask = jnp.asarray(rng.random(n) > 0.5)
    masked = layer.apply(variables, (s, v), batch.senders, batch.receivers,
                         (es, ev), batch.edge_mask, node_mask=node_mask)
    keep = ~np.asarray(node_mask)
    np.testing.assert_array_equal(np.asarray(masked[0])[keep],
                                  np.asarray(s)[keep])
    np.testing.assert_array_equal(np.asarray(masked[1])[keep],
                                  np.asarray(v)[keep])
    upd = np.asarray(node_mask)
    np.testing.assert_allclose(np.asarray(masked[0])[upd],
                               np.asarray(plain[0])[upd], atol=2e-5)


def test_gvp_conv_general_configs_run_and_are_equivariant():
    """GVPConv configs beyond the fused-path defaults (other activations,
    vector_gate=False, aggr='add') run via the module-chain path and stay
    rotation-equivariant."""
    import jax
    import jax.numpy as jnp
    from scipy.stats import ortho_group

    from geometric_message_passing_tpu.models.gvpgnn import GVPConv

    rng = np.random.default_rng(0)
    n, e = 10, 26
    node_dims, edge_dims = (7, 4), (5, 2)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = np.ones(e, bool)
    s = rng.standard_normal((n, node_dims[0])).astype(np.float32)
    v = rng.standard_normal((n, node_dims[1], 3)).astype(np.float32)
    es = rng.standard_normal((e, edge_dims[0])).astype(np.float32)
    ev = rng.standard_normal((e, edge_dims[1], 3)).astype(np.float32)
    Q = ortho_group.rvs(3, random_state=1).astype(np.float32)
    if np.linalg.det(Q) < 0:
        Q = -Q

    # aggr='add' is paired with a non-default activation: with the default
    # acts it would dispatch through the flat fused-weight path rather than
    # _module_chain, and the point here is to cover the chain path.
    for kw in (dict(act_s="swish"), dict(vector_gate=False),
               dict(aggr="add", act_s="swish")):
        conv = GVPConv(node_dims, edge_dims, n_layers=2, **kw)
        variables = conv.init(jax.random.PRNGKey(0), (s, v), senders,
                              receivers, (es, ev), mask)
        so, vo = conv.apply(variables, (s, v), senders, receivers,
                            (es, ev), mask)
        so_r, vo_r = conv.apply(variables, (s, v @ Q.T), senders, receivers,
                                (es, ev @ Q.T), mask)
        np.testing.assert_allclose(np.asarray(so_r), np.asarray(so),
                                   rtol=2e-4, atol=2e-4, err_msg=str(kw))
        np.testing.assert_allclose(np.asarray(vo_r), np.asarray(vo @ Q.T),
                                   rtol=2e-4, atol=2e-4, err_msg=str(kw))
