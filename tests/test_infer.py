"""Predictor (experiments/infer.py): compiled fixed-bucket inference."""

import jax
import numpy as np

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.experiments.infer import Predictor
from geometric_message_passing_tpu.experiments.train import seed_everything
from geometric_message_passing_tpu.graph import GraphLoader
from geometric_message_passing_tpu.models import model_registry


def test_predictor_matches_direct_apply_and_reuses_compile():
    graphs = ds.create_star_graphs(num=23, fold=[4, 5], dim=3, seed=0)
    model = model_registry["egnn"](num_layers=2, emb_dim=16, in_dim=1,
                                   out_dim=2)
    loader = GraphLoader(graphs, batch_size=8)
    variables = model.init(seed_everything(0), next(iter(loader)))

    pred = Predictor(model, variables, batch_size=8)
    y = pred.predict(graphs)
    assert y.shape == (23, 2)
    assert pred.trace_count == 1

    # direct reference: same padded batches, same outputs
    ref = []
    left = len(graphs)
    for batch in GraphLoader(graphs, batch_size=8, pad=pred.pad):
        n = min(8, left); left -= n
        ref.append(np.asarray(model.apply(variables, batch))[:n])
    np.testing.assert_allclose(y, np.concatenate(ref), atol=1e-6)

    # second call, same bucket: no recompile
    y2 = pred.predict(graphs[:9])
    assert pred.trace_count == 1
    np.testing.assert_allclose(y2, y[:9], atol=1e-6)

    # bigger graphs grow the bucket exactly once
    big = ds.create_star_graphs(num=9, fold=[9], dim=3, seed=1)
    yb = pred.predict(big)
    assert yb.shape == (9, 2) and pred.trace_count == 2
    # and the grown bucket still serves the small graphs with no recompile
    pred.predict(graphs[:5])
    assert pred.trace_count == 2


def test_predictor_triplet_models():
    graphs = ds.create_star_graphs(num=10, fold=[4], dim=3, seed=0)
    model = model_registry["spherenet"](
        num_layers=1, hidden_channels=16, out_emb_channels=16,
        int_emb_size=8, num_spherical=3, num_radial=3, in_dim=1, out_dim=1)
    loader = GraphLoader(graphs, batch_size=4, with_quads=True)
    variables = model.init(seed_everything(0), next(iter(loader)))
    pred = Predictor(model, variables, batch_size=4, needs_triplets=True,
                     with_quads=True)
    y = pred.predict(graphs)
    assert y.shape == (10, 1) and np.isfinite(y).all()
    assert pred.trace_count == 1


def test_predictor_mesh_sharded_matches_single_device():
    """Predictor(mesh=...) — data-parallel batch inference over a device
    mesh — returns exactly the single-device predictions, including a
    ragged final group (7 batches over 4 devices) and a partial last
    batch."""
    from geometric_message_passing_tpu.parallel.mesh import make_mesh

    graphs = ds.create_star_graphs(num=27, fold=[4, 5], dim=3, seed=3)
    model = model_registry["egnn"](num_layers=2, emb_dim=16, in_dim=1,
                                   out_dim=2)
    loader = GraphLoader(graphs, batch_size=4)
    variables = model.init(seed_everything(0), next(iter(loader)))

    single = Predictor(model, variables, batch_size=4)
    y_ref = single.predict(graphs)

    mesh = make_mesh((4,), ("dp",), devices=jax.devices()[:4])
    sharded = Predictor(model, variables, batch_size=4, mesh=mesh)
    y = sharded.predict(graphs)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=1e-5)
    assert sharded.trace_count == 1

    # second call with fewer graphs: same bucket, no recompile
    y2 = sharded.predict(graphs[:10])
    np.testing.assert_allclose(y2, y_ref[:10], atol=1e-5)
    assert sharded.trace_count == 1
