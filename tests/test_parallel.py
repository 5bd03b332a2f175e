"""Multi-device (CPU-simulated, 8 virtual devices) sharding tests:
DP gradient equivalence and edge-partitioned halo-exchange equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.experiments.train import l1_sum_loss, seed_everything
from geometric_message_passing_tpu.graph import GraphLoader, batch_graphs, pad_sizes
from geometric_message_passing_tpu.models import EGNNModel
from geometric_message_passing_tpu.ops.scatter import segment_sum
from geometric_message_passing_tpu.parallel import dp_train_step, make_mesh, shard_batches
from geometric_message_passing_tpu.parallel.halo import gp_edge_aggregate


def test_devices_available():
    assert jax.device_count() >= 8


def test_dp_matches_single_device():
    """DP over 4 shards must produce the same parameters as one device
    processing the concatenated batch (sum-loss => grads add exactly)."""
    n_dev = 4
    mesh = make_mesh((n_dev,), ("dp",), devices=jax.devices()[:n_dev])
    graphs = ds.create_star_graphs(num=8, fold=[4], dim=3, seed=0)
    n_pad, e_pad, g_pad = pad_sizes(graphs, 2)

    model = EGNNModel(num_layers=2, emb_dim=16, in_dim=1, out_dim=1)
    big = batch_graphs(graphs, n_pad * n_dev, e_pad * n_dev, (g_pad) * n_dev)
    variables = model.init(seed_everything(0), big)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    # single device reference: grads of sum-l1 over all 8 graphs
    def loss_single(params):
        pred = model.apply({**variables, "params": params}, big)
        return l1_sum_loss(pred, big)

    g_ref = jax.grad(loss_single)(variables["params"])

    # dp: 4 shards of 2 graphs
    sharded = shard_batches(graphs, n_dev, n_pad, e_pad, g_pad)
    step = dp_train_step(model, tx, mesh, l1_sum_loss)
    new_vars, _, loss = step(variables, opt_state, sharded)

    # recompute ref update
    updates, _ = tx.update(g_ref, opt_state, variables["params"])
    ref_params = optax.apply_updates(variables["params"], updates)
    flat_a = jax.tree_util.tree_leaves(new_vars["params"])
    flat_b = jax.tree_util.tree_leaves(ref_params)
    for a, b in zip(flat_a, flat_b):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_halo_exchange_matches_local():
    """Edge-partitioned aggregation over 8 devices == single-device
    segment_sum."""
    n_dev = 8
    mesh = make_mesh((n_dev,), ("gp",))
    rng = np.random.default_rng(0)
    n_total, e_total, d = 64, 256, 16
    h = rng.normal(size=(n_total, d)).astype(np.float32)
    senders = rng.integers(0, n_total, e_total).astype(np.int32)
    receivers = rng.integers(0, n_total, e_total).astype(np.int32)
    mask = rng.random(e_total) > 0.1

    def message_fn(h_i, h_j):
        return h_i * 0.5 + h_j

    ref = np.asarray(
        segment_sum(jnp.asarray(message_fn(h[receivers], h[senders])),
                    jnp.asarray(receivers), n_total,
                    mask=jnp.asarray(mask))
    )

    def shard_fn(h_local, s, r, m):
        return gp_edge_aggregate(h_local, s[0], r[0], m[0], message_fn,
                                 n_total, axis="gp")

    mapped = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("gp"), P("gp"), P("gp"), P("gp")),
        out_specs=P("gp"),
        check_vma=False,
    ))
    out = mapped(
        jnp.asarray(h),
        jnp.asarray(senders.reshape(n_dev, -1)),
        jnp.asarray(receivers.reshape(n_dev, -1)),
        jnp.asarray(mask.reshape(n_dev, -1)),
    )
    assert np.allclose(np.asarray(out), ref, atol=1e-4)
