"""MACEForceField (production-shape MACE over the real interaction blocks)
+ the chunked edge convolution and the molecular-box generator (round 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import ortho_group

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.graph import GraphLoader
from geometric_message_passing_tpu.models import MACEForceField


def _batch(n_nodes=60, seed=0):
    g = ds.create_molecular_boxes(num=2, n_nodes=n_nodes, cutoff=3.0,
                                  avg_degree=8, n_species=4, seed=seed)
    loader = GraphLoader(g, batch_size=2)
    return g, next(iter(loader))


def test_molecular_box_generator_properties():
    g = ds.create_molecular_boxes(num=1, n_nodes=500, cutoff=3.0,
                                  avg_degree=10, seed=1)[0]
    s, r = g.edge_index
    assert not np.any(s == r)                    # no self loops
    d = np.linalg.norm(g.pos[s] - g.pos[r], axis=-1)
    assert np.all(d <= 3.0 + 1e-6)
    # symmetric (radius graphs are undirected as directed-both-ways)
    fwd = set(map(tuple, g.edge_index.T))
    assert all((j, i) in fwd for i, j in fwd)
    # degree in the right ballpark (boundary effects shave ~10-20%)
    assert 6 < g.num_edges / g.num_nodes < 11


@pytest.mark.parametrize("interaction", [
    "RealAgnosticResidualInteractionBlock", "RealAgnosticInteractionBlock"])
def test_mace_ff_runs_and_is_invariant(interaction):
    _, batch = _batch()
    model = MACEForceField(num_layers=2, emb_dim=8, max_ell=2, correlation=2,
                           in_dim=4, interaction=interaction,
                           interaction_first=interaction)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert out.shape == (batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))

    Q = ortho_group.rvs(3, random_state=0).astype(np.float32)
    batch_r = batch.replace(pos=batch.pos @ Q.T + 0.73)
    out_r = model.apply(variables, batch_r)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out),
                               rtol=2e-4, atol=2e-4)


def test_mace_ff_chunked_matches_unchunked():
    """edge_chunk AND node_chunk change the execution schedule only:
    forward and grads must match the single-pass model up to
    sum-reassociation roundoff — including chunk sizes that do not divide
    E / N (pad paths)."""
    _, batch = _batch(seed=3)
    kw = dict(num_layers=2, emb_dim=8, max_ell=2, correlation=2, in_dim=4,
              node_chunk=None)
    model = MACEForceField(**kw)
    variables = model.init(jax.random.PRNGKey(0), batch)

    E = batch.senders.shape[0]
    N = batch.atoms.shape[0]
    kw.pop("node_chunk")
    model_c = MACEForceField(**kw, edge_chunk=max(E // 3 - 1, 1),
                             node_chunk=max(N // 2 - 1, 1))
    # identical parameter trees between modes
    vc = model_c.init(jax.random.PRNGKey(0), batch)
    chex_tree = jax.tree_util.tree_structure
    assert chex_tree(vc) == chex_tree(variables)

    out = np.asarray(model.apply(variables, batch))
    out_c = np.asarray(model_c.apply(variables, batch))
    np.testing.assert_allclose(out_c, out, rtol=1e-4, atol=1e-4)

    def loss(m):
        def f(params):
            return jnp.sum(m.apply({**variables, "params": params},
                                   batch) ** 2)
        return f

    g = jax.grad(loss(model))(variables["params"])
    g_c = jax.grad(loss(model_c))(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3),
        g, g_c)


def test_mace_ff_trains_a_step():
    """One adam step through the scale model keeps finite loss/params."""
    import optax

    _, batch = _batch(seed=5)
    model = MACEForceField(num_layers=1, emb_dim=8, max_ell=1, correlation=2,
                           in_dim=4, edge_chunk=64)
    variables = model.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    opt = tx.init(variables["params"])

    def loss_fn(params):
        out = model.apply({**variables, "params": params}, batch)
        return jnp.sum(jnp.abs(out - batch.y))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    updates, opt = tx.update(grads, opt, variables["params"])
    params = optax.apply_updates(variables["params"], updates)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(params))


def test_uvu_per_path_matches_combined():
    """The large-E dispatch (per-path blocks instead of the dense combined
    CG) is a pure FLOP-saving reassociation — forms must agree exactly."""
    from geometric_message_passing_tpu.irreps import Irreps
    from geometric_message_passing_tpu.nn.tensor_product import (
        EdgeTensorProductUVU)

    tp = EdgeTensorProductUVU(
        Irreps("4x0e+4x1o+4x2e"), Irreps("1x0e+1x1o+1x2e"),
        Irreps("4x0e+4x1o+4x2e"))
    rng = np.random.default_rng(0)
    E = 33
    x = jnp.asarray(rng.standard_normal((E, tp.irreps_in.dim)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((E, tp.irreps_sh.dim)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((E, tp.weight_numel)), jnp.float32)
    a = np.asarray(tp._apply_combined(x, sh, w))
    b = np.asarray(tp._apply_per_path(x, sh, w))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_mace_ff_folded_linear_matches(monkeypatch):
    """The 100k-node memory fix folds the post-conv IrrepsLinear into the
    edge chunks (linear commutes with segment-sum — exact).  Force the fold
    at toy sizes and compare against the unfolded model."""
    from geometric_message_passing_tpu.nn import mace_blocks

    _, batch = _batch(seed=7)
    kw = dict(num_layers=2, emb_dim=8, max_ell=2, correlation=2, in_dim=4)
    model = MACEForceField(**kw)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = np.asarray(model.apply(variables, batch))

    monkeypatch.setattr(mace_blocks._InteractionBase, "FOLD_ACC_ELEMS", 0)
    E = batch.senders.shape[0]
    model_f = MACEForceField(**kw, edge_chunk=max(E // 2 - 1, 1))
    vf = model_f.init(jax.random.PRNGKey(0), batch)
    assert (jax.tree_util.tree_structure(vf)
            == jax.tree_util.tree_structure(variables))
    out_f = np.asarray(model_f.apply(variables, batch))
    np.testing.assert_allclose(out_f, out, rtol=2e-4, atol=2e-4)


def test_tfn_ff_runs_and_is_invariant():
    """TFNForceField (scale TFN over the uvu conv) — shape, finiteness,
    O(3) invariance of the scalar readout."""
    from geometric_message_passing_tpu.models import TFNForceField

    _, batch = _batch()
    model = TFNForceField(num_layers=2, emb_dim=8, max_ell=2, in_dim=4,
                          node_chunk=None)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert out.shape == (batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))

    Q = ortho_group.rvs(3, random_state=1).astype(np.float32)
    batch_r = batch.replace(pos=batch.pos @ Q.T + 0.31)
    out_r = model.apply(variables, batch_r)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out),
                               rtol=2e-4, atol=2e-4)


def test_tfn_ff_chunked_matches_unchunked():
    """TFNForceField composes with the edge-chunked conv exactly."""
    from geometric_message_passing_tpu.models import TFNForceField

    _, batch = _batch(seed=5)
    kw = dict(num_layers=2, emb_dim=8, max_ell=2, in_dim=4, node_chunk=None)
    model = TFNForceField(**kw)
    chunked = TFNForceField(**kw, edge_chunk=64)
    variables = model.init(jax.random.PRNGKey(0), batch)
    vc = chunked.init(jax.random.PRNGKey(0), batch)
    assert (jax.tree_util.tree_structure(vc)
            == jax.tree_util.tree_structure(variables))
    out = np.asarray(model.apply(variables, batch))
    out_c = np.asarray(chunked.apply(variables, batch))
    np.testing.assert_allclose(out_c, out, rtol=2e-4, atol=2e-4)


def test_tfn_ff_trains_a_step():
    import optax

    from geometric_message_passing_tpu.models import TFNForceField

    _, batch = _batch(seed=7)
    model = TFNForceField(num_layers=2, emb_dim=8, max_ell=1, in_dim=4,
                          node_chunk=None)
    variables = model.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    opt = tx.init(variables["params"])

    def loss_of(params):
        out = model.apply({**variables, "params": params}, batch)
        return jnp.sum(jnp.abs(out - batch.y))

    l0 = float(loss_of(variables["params"]))
    g = jax.grad(loss_of)(variables["params"])
    updates, opt = tx.update(g, opt, variables["params"])
    params = optax.apply_updates(variables["params"], updates)
    l1 = float(loss_of(params))
    assert np.isfinite(l0) and np.isfinite(l1) and l1 < l0


def test_uvu_pair_grouped_matches_per_path():
    """Round-5 at-scale form: all l3 outputs of one (l1,l2) operand pair
    batched into one einsum.  Pure reassociation of the per-path form —
    must agree to f32 roundoff (and with the dense combined form)."""
    from geometric_message_passing_tpu.irreps import Irreps
    from geometric_message_passing_tpu.nn.tensor_product import (
        EdgeTensorProductUVU)

    hidden = (Irreps.spherical_harmonics(3) * 8).sort().simplify()
    sh = Irreps.spherical_harmonics(3)
    tp = EdgeTensorProductUVU(hidden, sh, hidden)
    assert len(tp._pair_groups) < len(tp.paths)
    rng = np.random.default_rng(1)
    E = 57
    x = jnp.asarray(rng.standard_normal((E, hidden.dim)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((E, sh.dim)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((E, tp.weight_numel)), jnp.float32)
    a = np.asarray(tp._apply_per_path(x, s, w))
    b = np.asarray(tp._apply_pair_grouped(x, s, w))
    c = np.asarray(tp._apply_combined(x, s, w))
    d = np.asarray(tp._apply_bcast(x, s, w))
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(c, a, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(d, a, rtol=2e-5, atol=2e-5)


def test_segment_sum_into_matches_add_form():
    """The in-place accumulator (round-5 box-scale traffic fix) equals the
    acc + segment_sum form on both branches of its size dispatch."""
    from geometric_message_passing_tpu.ops import scatter

    rng = np.random.default_rng(2)
    for n_seg in (64, scatter._ONEHOT_MAX_SEGMENTS + 7):
        E = 512
        acc = jnp.asarray(rng.standard_normal((n_seg, 5)), jnp.float32)
        data = jnp.asarray(rng.standard_normal((E, 5)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, n_seg, E), jnp.int32)
        mask = jnp.asarray(rng.random(E) > 0.2)
        got = np.asarray(scatter.segment_sum_into(acc, data, ids, mask=mask))
        want = np.asarray(acc + scatter.segment_sum(data, ids, n_seg,
                                                    mask=mask))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mace_ff_scale_branches_match_toy(monkeypatch):
    """Force BOTH at-scale code paths (in-place scatter accumulator +
    pair-grouped uvu dispatch) at toy sizes and compare fwd + grads against
    the unchunked reference path."""
    from geometric_message_passing_tpu.nn.tensor_product import (
        EdgeTensorProductUVU)
    from geometric_message_passing_tpu.ops import scatter

    _, batch = _batch(seed=7)
    kw = dict(num_layers=2, emb_dim=8, max_ell=2, correlation=2, in_dim=4,
              node_chunk=None)
    model = MACEForceField(**kw)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = np.asarray(model.apply(variables, batch))

    E = batch.senders.shape[0]
    monkeypatch.setattr(scatter, "_INPLACE_MIN_SEGMENTS", 1)
    monkeypatch.setattr(EdgeTensorProductUVU, "COMBINED_MAX_EDGES", 1)
    model_s = MACEForceField(**{k: v for k, v in kw.items()
                                if k != "node_chunk"},
                             edge_chunk=max(E // 3 - 1, 1))
    out_s = np.asarray(model_s.apply(variables, batch))
    np.testing.assert_allclose(out_s, out, rtol=1e-4, atol=1e-4)

    def loss(m):
        def f(params):
            return jnp.sum(m.apply({**variables, "params": params},
                                   batch) ** 2)
        return f

    g = jax.grad(loss(model))(variables["params"])
    g_s = jax.grad(loss(model_s))(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3),
        g, g_s)
