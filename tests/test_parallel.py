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


class TestTensorParallel:
    """Mul-sharded tensor parallelism (parallel/tp.py): a 4-way channel shard
    of the full MACE model must reproduce the single-device forward exactly
    and produce per-shard gradients that are slices of the full gradients."""

    def _setup(self, tp_size=4):
        from geometric_message_passing_tpu import datasets as ds
        from geometric_message_passing_tpu.graph import (
            assemble_batch, build_slot_data)
        from geometric_message_passing_tpu.models import MACEModel

        graphs = ds.create_star_graphs(num=6, fold=[3, 4], dim=3,
                                       target="max", seed=0)
        slot = build_slot_data(graphs)
        batch = assemble_batch(slot, jnp.arange(6, dtype=jnp.int32))
        model = MACEModel(num_layers=2, emb_dim=8, in_dim=1, out_dim=1,
                          max_ell=2, correlation=2)
        variables = model.init(jax.random.PRNGKey(0), batch)
        return model, variables, batch

    def test_tp_forward_matches_single_device(self):
        from geometric_message_passing_tpu.parallel.mesh import make_mesh
        from geometric_message_passing_tpu.parallel.tp import (
            shard_mace_variables, tp_apply)

        model, variables, batch = self._setup()
        full_out = model.apply(variables, batch)

        mesh = make_mesh((4,), ("tp",), devices=jax.devices()[:4])
        shards = shard_mace_variables(variables, model, 4)
        out = tp_apply(model, shards, mesh)(shards, batch)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full_out),
                                   atol=1e-5)

    def test_tp_gradients_match_sliced_full_gradients(self):
        import optax

        from geometric_message_passing_tpu.parallel.mesh import make_mesh
        from geometric_message_passing_tpu.parallel.tp import (
            shard_mace_variables, tp_apply, tp_train_step)

        model, variables, batch = self._setup()

        def loss_fn(pred, b):
            err = jnp.abs(pred - b.y) * b.graph_mask[:, None]
            return jnp.sum(err)

        # full-model gradients
        def full_loss(params):
            pred, _ = model.apply({**variables, "params": params}, batch,
                                  train=True, mutable=["batch_stats"],
                                  rngs={"dropout": jax.random.PRNGKey(0)})
            return loss_fn(pred, batch)

        g_full = jax.grad(full_loss)(variables["params"])

        mesh = make_mesh((4,), ("tp",), devices=jax.devices()[:4])
        shards = shard_mace_variables(variables, model, 4)
        tx = optax.sgd(0.0)
        opt_state = jax.tree.map(
            lambda *_: None, None)  # placeholder, built below
        local_params = jax.tree.map(lambda x: x, shards["params"])
        opt_state = jax.vmap(tx.init)(local_params)
        step = tp_train_step(model, tx, mesh, loss_fn)
        new_vars, _, loss = step(shards, opt_state, batch)

        # with lr=0 params are unchanged; instead re-derive grads by probing
        # with lr=1 sgd: new = old - grad
        tx1 = optax.sgd(1.0)
        opt1 = jax.vmap(tx1.init)(shards["params"])
        step1 = tp_train_step(model, tx1, mesh, loss_fn)
        new_vars1, _, _ = step1(shards, opt1, batch)
        g_shard = jax.tree.map(lambda a, b: a - b, shards["params"],
                               new_vars1["params"])

        # compare the embedding shard grads against the sliced full grads
        g_emb_full = np.asarray(g_full["emb_in"]["embedding"])  # [in, 8]
        g_emb_shard = np.asarray(
            new_vars1["params"]["emb_in"]["embedding"] * 0
            + g_shard["emb_in"]["embedding"]
        )  # [4, in, 2]
        for p in range(4):
            np.testing.assert_allclose(
                g_emb_shard[p], g_emb_full[..., p * 2 : (p + 1) * 2],
                rtol=1e-3, atol=1e-3)
        # and one IrrepsLinear row-shard
        gl_full = np.asarray(g_full["prod_0"]["IrrepsLinear_0"]["w0_0"])
        gl_shard = np.asarray(g_shard["prod_0"]["IrrepsLinear_0"]["w0_0"])
        for p in range(4):
            np.testing.assert_allclose(
                gl_shard[p], gl_full[p * 2 : (p + 1) * 2],
                rtol=1e-3, atol=1e-3)


def test_tfn_tensor_parallel_matches_single_device():
    """The rule-based sharder (parallel/tp.py::shard_model_variables) is
    model-agnostic: a 4-way mul-shard of TFNModel — whose conv GATES, so the
    local TP output regroups the merged full-model gates entry into
    per-gated-irrep entries — must reproduce the single-device forward
    exactly, and per-shard gradients must slice the full gradients."""
    import optax

    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.graph import (
        assemble_batch, build_slot_data)
    from geometric_message_passing_tpu.models import TFNModel
    from geometric_message_passing_tpu.parallel.mesh import make_mesh
    from geometric_message_passing_tpu.parallel.tp import (
        shard_model_variables, tp_apply, tp_train_step)

    graphs = ds.create_star_graphs(num=6, fold=[3, 4], dim=3,
                                   target="max", seed=0)
    slot = build_slot_data(graphs)
    batch = assemble_batch(slot, jnp.arange(6, dtype=jnp.int32))
    model = TFNModel(num_layers=2, emb_dim=8, in_dim=1, out_dim=1,
                     max_ell=2, pool="sum")
    variables = model.init(jax.random.PRNGKey(0), batch)
    full_out = model.apply(variables, batch)

    mesh = make_mesh((4,), ("tp",), devices=jax.devices()[:4])
    shards = shard_model_variables(variables, model, 4)
    out = tp_apply(model, shards, mesh)(shards, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full_out),
                               rtol=2e-5, atol=2e-5)

    # gradient check via lr=1 sgd probing: new = old - grad
    def loss_fn(pred, b):
        return jnp.sum(jnp.abs(pred - b.y) * b.graph_mask[:, None])

    def full_loss(params):
        pred = model.apply({**variables, "params": params}, batch,
                           rngs={"dropout": jax.random.PRNGKey(0)})
        return loss_fn(pred, batch)

    g_full = jax.grad(full_loss)(variables["params"])
    tx1 = optax.sgd(1.0)
    opt1 = jax.vmap(tx1.init)(shards["params"])
    step1 = tp_train_step(model, tx1, mesh, loss_fn)
    new_vars1, _, _ = step1(shards, opt1, batch)
    g_shard = jax.tree.map(lambda a, b: a - b, shards["params"],
                           new_vars1["params"])
    g_emb_full = np.asarray(g_full["emb_in"]["embedding"])
    g_emb_shard = np.asarray(g_shard["emb_in"]["embedding"])
    for p in range(4):
        np.testing.assert_allclose(
            g_emb_shard[p], g_emb_full[..., p * 2 : (p + 1) * 2],
            rtol=1e-3, atol=1e-3)


def test_packed_halo_matches_single_device():
    """Packed boundary-only halo exchange (build_halo_plan +
    packed_halo_aggregate) reproduces the single-device gather->message->
    segment_sum over a random graph, and moves only the boundary payload."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from geometric_message_passing_tpu.ops.scatter import segment_sum
    from geometric_message_passing_tpu.parallel.halo import (
        build_halo_plan, packed_halo_aggregate)
    from geometric_message_passing_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    k, n_local, d, e = 4, 8, 16, 120
    n = k * n_local
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    snd = rng.integers(0, n, e).astype(np.int32)
    rcv = rng.integers(0, n, e).astype(np.int32)
    emask = rng.random(e) > 0.1

    def msg_fn(h_tgt, h_src):
        return h_tgt * 0.5 + jnp.tanh(h_src)

    ref = segment_sum(msg_fn(h[rcv], h[snd]), jnp.asarray(rcv), n,
                      mask=jnp.asarray(emask))

    plan = build_halo_plan(snd, rcv, n, k, edge_mask=emask)
    mesh = make_mesh((k,), ("gp",), devices=jax.devices()[:k])
    plan_arrays = {
        "send_idx": plan.send_idx, "send_mask": plan.send_mask,
        "edge_src_cat": plan.edge_src_cat,
        "edge_tgt_local": plan.edge_tgt_local, "edge_mask": plan.edge_mask,
    }

    def shard_fn(h_loc, pl):
        return packed_halo_aggregate(h_loc, pl, msg_fn, axis="gp")

    out = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("gp"), P("gp")),
        out_specs=P("gp"),
        check_vma=False,
    ))(h.reshape(k, n_local, d).reshape(k * n_local, d), plan_arrays)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # the packed payload is strictly smaller than a full all_gather
    assert plan.send_idx.shape[-1] < n_local * k


def test_packed_halo_overlapped_matches_single_device():
    """Overlapped packed halo (interior edges computed with no dependency on
    the all_to_all) reproduces the single-device aggregation exactly."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from geometric_message_passing_tpu.ops.scatter import segment_sum
    from geometric_message_passing_tpu.parallel.halo import (
        build_halo_plan, packed_halo_aggregate_overlapped)
    from geometric_message_passing_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    k, n_local, d, e = 4, 8, 16, 150
    n = k * n_local
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    snd = rng.integers(0, n, e).astype(np.int32)
    rcv = rng.integers(0, n, e).astype(np.int32)
    emask = rng.random(e) > 0.15

    def msg_fn(h_tgt, h_src):
        return h_tgt * 0.25 + jnp.tanh(h_src)

    ref = segment_sum(msg_fn(h[rcv], h[snd]), jnp.asarray(rcv), n,
                      mask=jnp.asarray(emask))

    plan = build_halo_plan(snd, rcv, n, k, edge_mask=emask)
    # the split partitions the edge set exactly
    assert int(plan.int_mask.sum()) + int(plan.bnd_mask.sum()) == int(
        emask.sum())
    mesh = make_mesh((k,), ("gp",), devices=jax.devices()[:k])
    plan_arrays = {
        "send_idx": plan.send_idx, "send_mask": plan.send_mask,
        "int_src": plan.int_src, "int_tgt": plan.int_tgt,
        "int_mask": plan.int_mask, "bnd_src_slot": plan.bnd_src_slot,
        "bnd_tgt": plan.bnd_tgt, "bnd_mask": plan.bnd_mask,
    }

    def shard_fn(h_loc, pl):
        return packed_halo_aggregate_overlapped(h_loc, pl, msg_fn, axis="gp")

    out = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("gp"), P("gp")),
        out_specs=P("gp"),
        check_vma=False,
    ))(h, plan_arrays)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


# ---------------------------------------------------------------------------
# Pipeline parallelism (GPipe over ppermute ring)
# ---------------------------------------------------------------------------


def _pp_stage_fn(params, x, senders, receivers, mask):
    """One message-passing layer as a pipeline stage: gather -> edge MLP ->
    masked segment-sum -> residual update."""
    h = x["h"]
    msg = jnp.tanh((h[senders] - h[receivers]) @ params["w_msg"])
    agg = segment_sum(msg, receivers, h.shape[0], mask=mask)
    return {"h": h + agg @ params["w_upd"]}


def _pp_setup(n_stages, n_micro, seed=0):
    from geometric_message_passing_tpu.parallel.pp import stack_stage_params

    rng = np.random.default_rng(seed)
    n, e, dim = 12, 20, 8
    params = stack_stage_params([
        {"w_msg": jnp.asarray(rng.standard_normal((dim, dim)) * 0.3,
                              jnp.float32),
         "w_upd": jnp.asarray(rng.standard_normal((dim, dim)) * 0.3,
                              jnp.float32)}
        for _ in range(n_stages)
    ])
    h_mb = jnp.asarray(rng.standard_normal((n_micro, n, dim)), jnp.float32)
    senders = jnp.asarray(rng.integers(0, n, (n_micro, e)), jnp.int32)
    receivers = jnp.asarray(rng.integers(0, n, (n_micro, e)), jnp.int32)
    mask = jnp.asarray(rng.random((n_micro, e)) < 0.8)
    return params, {"h": h_mb}, (senders, receivers, mask)


@pytest.mark.parametrize("n_micro", [8, 6])
def test_pipeline_matches_sequential(n_micro):
    """GPipe pipeline over 4 stages == scanning each microbatch through all
    stages on one device (per-microbatch graph topology included)."""
    from geometric_message_passing_tpu.parallel.pp import (
        pipeline_apply, sequential_apply)

    n_stages = 4
    mesh = make_mesh((n_stages,), ("pp",), devices=jax.devices()[:n_stages])
    params, x_mb, aux_mb = _pp_setup(n_stages, n_micro)
    out_pp = pipeline_apply(_pp_stage_fn, params, x_mb, aux_mb,
                            mesh=mesh, axis="pp")
    out_ref = sequential_apply(_pp_stage_fn, params, x_mb, aux_mb)
    np.testing.assert_allclose(np.asarray(out_pp["h"]),
                               np.asarray(out_ref["h"]), atol=1e-6)


def test_pipeline_gradients_match_sequential():
    """Differentiating THROUGH the pipeline schedule (scan + ppermute)
    produces the same parameter and input gradients as the sequential
    twin — the backward pipeline comes from autodiff, not hand scheduling."""
    from geometric_message_passing_tpu.parallel.pp import (
        pipeline_apply, sequential_apply)

    n_stages, n_micro = 4, 8
    mesh = make_mesh((n_stages,), ("pp",), devices=jax.devices()[:n_stages])
    params, x_mb, aux_mb = _pp_setup(n_stages, n_micro, seed=3)

    def loss_pp(p, x):
        out = pipeline_apply(_pp_stage_fn, p, x, aux_mb, mesh=mesh, axis="pp")
        return jnp.sum(jnp.sin(out["h"]))

    def loss_ref(p, x):
        out = sequential_apply(_pp_stage_fn, p, x, aux_mb)
        return jnp.sum(jnp.sin(out["h"]))

    gp, gx = jax.grad(loss_pp, argnums=(0, 1))(params, x_mb)
    rp, rx = jax.grad(loss_ref, argnums=(0, 1))(params, x_mb)
    for a, b in zip(jax.tree_util.tree_leaves((gp, gx)),
                    jax.tree_util.tree_leaves((rp, rx))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_tp_hybrid_matches_single_device():
    """2-D (dp=2, tp=4) hybrid step: tp shards the channel (mul) axis inside
    each dp replica, dp shards the graphs.  One sgd(1.0) probe step must
    reproduce the single-device gradients (checked on the embedding shard and
    an IrrepsLinear row-shard) and the global sum-loss."""
    import optax

    from geometric_message_passing_tpu.models import MACEModel
    from geometric_message_passing_tpu.parallel.mesh import make_mesh
    from geometric_message_passing_tpu.parallel.tp import (
        dp_tp_train_step, shard_mace_variables)

    dp, tp = 2, 4
    graphs = ds.create_star_graphs(num=8, fold=[4], dim=3, target="max",
                                   seed=0)
    n_pad, e_pad, g_pad = pad_sizes(graphs, 4)
    # batch_norm off: dp shards would otherwise normalize by per-shard batch
    # statistics, which is a different (also valid) model than the
    # single-device reference
    model = MACEModel(num_layers=2, emb_dim=8, in_dim=1, out_dim=1,
                      max_ell=2, correlation=2, batch_norm=False)
    big = batch_graphs(graphs, n_pad * dp, e_pad * dp, g_pad * dp)
    variables = model.init(seed_everything(0), big)

    def full_loss(params):
        pred, _ = model.apply({**variables, "params": params}, big,
                              train=True, mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(0)})
        return l1_sum_loss(pred, big)

    loss_ref = float(full_loss(variables["params"]))
    g_full = jax.grad(full_loss)(variables["params"])

    mesh = make_mesh((dp, tp), ("dp", "tp"), devices=jax.devices()[:dp * tp])
    shards = shard_mace_variables(variables, model, tp)
    sharded = shard_batches(graphs, dp, n_pad, e_pad, g_pad)
    tx = optax.sgd(1.0)
    opt = jax.vmap(tx.init)(shards["params"])
    step = dp_tp_train_step(model, tx, mesh, l1_sum_loss)
    new_vars, _, loss = step(shards, opt, sharded)
    g_shard = jax.tree.map(lambda a, b: a - b, shards["params"],
                           new_vars["params"])

    assert np.allclose(float(loss), loss_ref, rtol=1e-5)
    g_emb_full = np.asarray(g_full["emb_in"]["embedding"])
    g_emb_shard = np.asarray(g_shard["emb_in"]["embedding"])  # [tp, in, 2]
    for p in range(tp):
        np.testing.assert_allclose(
            g_emb_shard[p], g_emb_full[..., p * 2 : (p + 1) * 2],
            rtol=1e-3, atol=1e-4)
    gl_full = np.asarray(g_full["prod_0"]["IrrepsLinear_0"]["w0_0"])
    gl_shard = np.asarray(g_shard["prod_0"]["IrrepsLinear_0"]["w0_0"])
    for p in range(tp):
        np.testing.assert_allclose(
            gl_shard[p], gl_full[p * 2 : (p + 1) * 2], rtol=1e-3, atol=1e-4)


def test_dp_autoshard_matches_single_device():
    """pjit-style auto-partitioned DP (NamedSharding annotations on the big
    block-diagonal batch, XLA SPMD inserts the collectives) must reproduce
    the single-device adam step exactly — same program, partitioned."""
    import optax

    from geometric_message_passing_tpu.parallel.data import (
        dp_train_step_autoshard)

    n_dev = 4
    mesh = make_mesh((n_dev,), ("dp",), devices=jax.devices()[:n_dev])
    graphs = ds.create_star_graphs(num=8, fold=[4], dim=3, seed=0)
    n_pad, e_pad, g_pad = pad_sizes(graphs, 2)
    model = EGNNModel(num_layers=2, emb_dim=16, in_dim=1, out_dim=1)
    big = batch_graphs(graphs, n_pad * n_dev, e_pad * n_dev, g_pad * n_dev)
    variables = model.init(seed_everything(0), big)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    def loss_single(params):
        pred = model.apply({**variables, "params": params}, big)
        return l1_sum_loss(pred, big)

    g_ref = jax.grad(loss_single)(variables["params"])
    updates, _ = tx.update(g_ref, opt_state, variables["params"])
    ref_params = optax.apply_updates(variables["params"], updates)

    step = dp_train_step_autoshard(model, tx, mesh, l1_sum_loss)
    new_vars, _, loss = step(variables, opt_state, big)
    assert np.allclose(float(loss), float(loss_single(variables["params"])),
                       rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_vars["params"]),
                    jax.tree_util.tree_leaves(ref_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gp_egnn_layer_matches_single_device():
    """A REAL model layer over the packed halo: edge-partitioned EGNNLayer
    forward (h update + scatter-mean position update) over 4 devices must
    equal the single-device layer."""
    from geometric_message_passing_tpu.models.egnn import EGNNLayer
    from geometric_message_passing_tpu.parallel.halo import (
        build_halo_plan, gp_egnn_layer)
    from geometric_message_passing_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    k, n_local, d, e = 4, 8, 16, 140
    n = k * n_local
    h = rng.normal(size=(n, d)).astype(np.float32)
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    snd = rng.integers(0, n, e).astype(np.int32)
    rcv = rng.integers(0, n, e).astype(np.int32)
    emask = rng.random(e) > 0.1

    layer = EGNNLayer(emb_dim=d, aggr="add")
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(h),
                           jnp.asarray(pos), jnp.asarray(snd),
                           jnp.asarray(rcv), jnp.asarray(emask))
    ref_h, ref_pos = layer.apply(variables, jnp.asarray(h), jnp.asarray(pos),
                                 jnp.asarray(snd), jnp.asarray(rcv),
                                 jnp.asarray(emask))

    plan = build_halo_plan(snd, rcv, n, k, edge_mask=emask)
    plan_arrays = {
        "send_idx": plan.send_idx, "send_mask": plan.send_mask,
        "edge_src_cat": plan.edge_src_cat,
        "edge_tgt_local": plan.edge_tgt_local, "edge_mask": plan.edge_mask,
    }
    mesh = make_mesh((k,), ("gp",), devices=jax.devices()[:k])
    out_h, out_pos = jax.jit(shard_map(
        lambda hp, pp, pl: gp_egnn_layer(layer, variables, hp, pp, pl),
        mesh=mesh, in_specs=(P("gp"), P("gp"), P("gp")),
        out_specs=(P("gp"), P("gp")), check_vma=False,
    ))(jnp.asarray(h), jnp.asarray(pos), plan_arrays)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_pos), np.asarray(ref_pos),
                               atol=2e-5)


def test_zero_dp_matches_single_device():
    """ZeRO-1 DP (reduce-scattered grads, 1/N-sharded adam moments,
    all-gathered param slices) must reproduce the single-device adam step
    exactly, with two steps taken to exercise the carried sharded state."""
    from geometric_message_passing_tpu.parallel import zero_dp_train_step, zero_init

    n_dev = 4
    mesh = make_mesh((n_dev,), ("dp",), devices=jax.devices()[:n_dev])
    graphs = ds.create_star_graphs(num=8, fold=[4], dim=3, seed=0)
    n_pad, e_pad, g_pad = pad_sizes(graphs, 2)
    model = EGNNModel(num_layers=2, emb_dim=16, in_dim=1, out_dim=1)
    big = batch_graphs(graphs, n_pad * n_dev, e_pad * n_dev, g_pad * n_dev)
    variables = model.init(seed_everything(0), big)
    tx = optax.adam(1e-3)

    # reference: two plain single-device adam steps on the concatenated batch
    ref_params = variables["params"]
    ref_opt = tx.init(ref_params)
    for _ in range(2):
        def loss_single(params):
            pred = model.apply({**variables, "params": params}, big)
            return l1_sum_loss(pred, big)
        g_ref = jax.grad(loss_single)(ref_params)
        updates, ref_opt = tx.update(g_ref, ref_opt, ref_params)
        ref_params = optax.apply_updates(ref_params, updates)

    sharded = shard_batches(graphs, n_dev, n_pad, e_pad, g_pad)
    opt_state = zero_init(tx, variables["params"], n_dev, mesh=mesh)
    # the sharded moments really are 1/N per chip
    from jax.flatten_util import ravel_pytree
    flat = ravel_pytree(variables["params"])[0]
    chunk = -(-flat.shape[0] // n_dev)
    mu_leaves = [x for x in jax.tree_util.tree_leaves(opt_state)
                 if x.ndim == 2]
    assert mu_leaves and all(x.shape == (n_dev, chunk) for x in mu_leaves)

    step = zero_dp_train_step(model, tx, mesh, l1_sum_loss,
                              variables["params"])
    new_vars, opt_state, loss = step(variables, opt_state, sharded)
    new_vars, opt_state, loss = step(new_vars, opt_state, sharded)

    for a, b in zip(jax.tree_util.tree_leaves(new_vars["params"]),
                    jax.tree_util.tree_leaves(ref_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# ---------------------------------------------------------------------------
# Multi-host runtime surface (round 3; SURVEY §2.5 "ICI AND DCN" mandate).
# Real DCN needs multiple processes — these exercise everything that is
# host-count-independent: the per-process batch-slicing convention, the
# single-process degradation of make_multihost_mesh, and the
# process-local -> global array assembly path (the exact API a pod uses).
# ---------------------------------------------------------------------------


def test_process_local_slice_convention():
    from geometric_message_passing_tpu.parallel.mesh import (
        process_local_slice)

    # contiguous per-process blocks in process order
    assert process_local_slice(12, 0, 4) == slice(0, 3)
    assert process_local_slice(12, 3, 4) == slice(9, 12)
    # covers the batch exactly
    got = np.concatenate([np.arange(12)[process_local_slice(12, p, 3)]
                          for p in range(3)])
    np.testing.assert_array_equal(got, np.arange(12))
    # indivisible batches are an error (pad upstream)
    with pytest.raises(ValueError):
        process_local_slice(10, 0, 4)
    # defaults read the live runtime (single process here)
    assert process_local_slice(8) == slice(0, 8)


def test_make_multihost_mesh_single_process_degradation():
    from geometric_message_passing_tpu.parallel.mesh import (
        make_multihost_mesh)

    mesh = make_multihost_mesh(("dp",))
    assert mesh.axis_names == ("dp",)
    assert mesh.shape["dp"] == len(jax.devices())

    mesh2 = make_multihost_mesh(("dp", "gp"))
    assert mesh2.shape["dp"] == 1  # process axis, one process
    assert mesh2.shape["gp"] == len(jax.devices())


def test_global_batch_from_local_roundtrip_and_compute():
    from geometric_message_passing_tpu.parallel.mesh import (
        global_batch_from_local, make_multihost_mesh, process_local_slice)

    mesh = make_multihost_mesh(("dp",))
    ndev = mesh.shape["dp"]
    full = {
        "x": np.arange(ndev * 6, dtype=np.float32).reshape(ndev, 6),
        "m": np.ones((ndev, 3), np.float32),
    }
    local = {k: v[process_local_slice(ndev)] for k, v in full.items()}
    arr = global_batch_from_local(mesh, local)
    # logical global content round-trips
    np.testing.assert_array_equal(np.asarray(arr["x"]), full["x"])
    # and the array is consumable by a shard_mapped collective program
    def body(b):
        return jax.lax.psum(b["x"].sum(), "dp")

    out = jax.jit(shard_map(body, mesh=mesh, in_specs=(P("dp"),),
                            out_specs=P()))(arr)
    np.testing.assert_allclose(float(out), full["x"].sum())


def test_pipeline_real_egnn_layer_matches_sequential():
    """Round-3 flagship PP demo: the REAL zoo EGNNLayer as pipeline stages.
    GPipe over the ppermute ring must match the single-device stack exactly,
    forward AND parameter gradients (each stage's grads come out resident on
    its own device)."""
    from geometric_message_passing_tpu.parallel import make_mesh
    from geometric_message_passing_tpu.parallel.pp import (
        egnn_pipeline_stage, pipeline_apply, sequential_apply,
        stack_stage_params)

    S, M, N, E, D = 4, 8, 10, 24, 16
    mesh = make_mesh((S,), ("pp",), devices=jax.devices()[:S])
    layer, stage_fn = egnn_pipeline_stage(emb_dim=D)
    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    pos0 = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    snd0 = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    rcv0 = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    params = stack_stage_params([
        layer.init(jax.random.PRNGKey(k), h0, pos0, snd0, rcv0,
                   jnp.ones(E, bool))["params"]
        for k in range(S)
    ])
    x_mb = {
        "h": jnp.asarray(rng.standard_normal((M, N, D)), jnp.float32),
        "pos": jnp.asarray(rng.standard_normal((M, N, 3)), jnp.float32),
    }
    snd = jnp.asarray(rng.integers(0, N, (M, E)), jnp.int32)
    rcv = jnp.asarray(rng.integers(0, N, (M, E)), jnp.int32)
    msk = jnp.asarray(rng.random((M, E)) < 0.9)

    out_pp = pipeline_apply(stage_fn, params, x_mb, (snd, rcv, msk),
                            mesh=mesh, axis="pp")
    out_seq = sequential_apply(stage_fn, params, x_mb, (snd, rcv, msk))
    np.testing.assert_allclose(np.asarray(out_pp["h"]),
                               np.asarray(out_seq["h"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_pp["pos"]),
                               np.asarray(out_seq["pos"]), atol=2e-5)

    def loss_pp(p):
        o = pipeline_apply(stage_fn, p, x_mb, (snd, rcv, msk),
                           mesh=mesh, axis="pp")
        return jnp.sum(o["h"] ** 2) + jnp.sum(o["pos"] ** 2)

    def loss_seq(p):
        o = sequential_apply(stage_fn, p, x_mb, (snd, rcv, msk))
        return jnp.sum(o["h"] ** 2) + jnp.sum(o["pos"] ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_seq = jax.jit(jax.grad(loss_seq))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        g_pp, g_seq)


# ---------------------------------------------------------------------------
# Irrep-payload halo: a REAL equivariant model (MACEForceField, uvu
# interaction conv) running edge-partitioned (round 4; the SURVEY §2.5
# "boundary node features (scalars + irrep channels)" mandate).


class TestGpMaceForceField:
    K = 4

    def _setup(self, **model_kw):
        from geometric_message_passing_tpu.models.mace_ff import MACEForceField

        graphs = ds.create_star_graphs(num=4, fold=[4, 5], dim=3, seed=0)
        n_pad, e_pad, g_pad = pad_sizes(graphs, 4)   # node_multiple=8 => %K
        big = batch_graphs(graphs, n_pad, e_pad, g_pad)
        model = MACEForceField(num_layers=2, emb_dim=4, max_ell=2,
                               correlation=2, in_dim=2, node_chunk=None,
                               **model_kw)
        variables = model.init(jax.random.PRNGKey(0), big)
        return model, variables, big

    def _gp_apply(self, model, big):
        """Build the plan + local batch and return a jitted gp forward
        (variables -> [G, 1] energies, replicated)."""
        from geometric_message_passing_tpu.graph import GraphBatch
        from geometric_message_passing_tpu.parallel.halo import (
            build_halo_plan, gp_local_batch)

        k = self.K
        plan = build_halo_plan(
            np.asarray(big.senders), np.asarray(big.receivers),
            big.num_nodes, k, edge_mask=np.asarray(big.edge_mask))
        local = gp_local_batch(big, plan)
        plan_arrays = {"send_idx": plan.send_idx,
                       "send_mask": plan.send_mask}
        gp_model = model.clone(gp_axis="gp")
        mesh = make_mesh((k,), ("gp",), devices=jax.devices()[:k])
        batch_spec = GraphBatch(
            atoms=P("gp"), pos=P("gp"), senders=P("gp"), receivers=P("gp"),
            graph_id=P("gp"), y=P(), node_mask=P("gp"), edge_mask=P("gp"),
            graph_mask=P(), first_node=P(), triplets=None)

        mapped = jax.jit(shard_map(
            lambda v, b, pl: gp_model.apply(v, b, halo_plan=pl),
            mesh=mesh, in_specs=(P(), batch_spec, P("gp")),
            out_specs=P(), check_vma=False,
        ))
        return lambda v: mapped(v, local, plan_arrays), plan

    def test_forward_matches_single_device(self):
        model, variables, big = self._setup()
        ref = np.asarray(model.apply(variables, big))
        fwd, plan = self._gp_apply(model, big)
        out = np.asarray(fwd(variables))
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)

    def test_gradients_match_single_device(self):
        model, variables, big = self._setup()

        def loss_ref(params):
            vs = {**variables, "params": params}
            return jnp.sum(jnp.square(model.apply(vs, big)))

        g_ref = jax.grad(loss_ref)(variables["params"])
        fwd, _ = self._gp_apply(model, big)

        def loss_gp(params):
            return jnp.sum(jnp.square(fwd({**variables, "params": params})))

        g_gp = jax.grad(loss_gp)(variables["params"])
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_gp = dict(jax.tree_util.tree_leaves_with_path(g_gp))
        assert flat_gp
        for path, a in flat_ref:
            b = flat_gp[path]
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3,
                err_msg=jax.tree_util.keystr(path))

    def test_edge_chunked_gp_matches_single_device(self):
        """The halo composes with the scale-regime edge-chunked conv
        (nn.scan + remat inside the shard_map body)."""
        model, variables, big = self._setup()
        ref = np.asarray(model.apply(variables, big))
        chunked = model.clone(edge_chunk=16)
        fwd, _ = self._gp_apply(chunked, big)
        out = np.asarray(fwd(variables))
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)

    def test_halo_stats_accounting(self):
        from geometric_message_passing_tpu.parallel.halo import halo_stats

        model, variables, big = self._setup()
        _, plan = self._gp_apply(model, big)
        hidden_dim = 4 * (1 + 3 + 5)      # emb_dim * sum(2l+1), max_ell=2
        st = halo_stats(plan, hidden_dim, num_nodes=big.num_nodes)
        assert st["k"] == self.K
        assert st["wire_bytes"] > 0
        assert st["useful_bytes"] <= st["wire_bytes"]
        # star graphs are hub-dominated: the packed exchange must not move
        # more than the full-gather fallback does
        assert st["wire_bytes"] <= 2 * st["allgather_bytes"]


class TestFitDP:
    """Round-5 item 4: the FULL experiment protocol (shuffles, plateau LR,
    best-val rule, checkpoint/resume, ledger) executed under a mesh."""

    def _data(self):
        graphs = ds.create_star_graphs(num=24, fold=[4], dim=3, seed=0)
        return graphs[:16], graphs[16:20], graphs[20:]

    def _run(self, n_dev, tmp=None, n_epochs=4, every=0):
        from geometric_message_passing_tpu.experiments.dp_fit import fit_dp
        from geometric_message_passing_tpu.experiments.train import (
            PlateauConfig, seed_everything)
        from geometric_message_passing_tpu.graph import batch_graphs
        from geometric_message_passing_tpu.parallel import make_mesh

        tr, va, te = self._data()
        mesh = make_mesh((n_dev,), ("dp",), devices=jax.devices()[:n_dev])
        model = EGNNModel(num_layers=2, emb_dim=16, in_dim=1, out_dim=1)
        n_pad, e_pad, g_pad = pad_sizes(tr, 2)
        init = batch_graphs(tr[:2], n_pad, e_pad, g_pad)
        variables = model.init(seed_everything(0), init)
        return fit_dp(
            model, variables, tr, va, te, n_epochs=n_epochs, mesh=mesh,
            batch_size=8, lr=1e-3,
            plateau=PlateauConfig(mode="max", patience=1, factor=0.5),
            seed=0, checkpoint_dir=tmp, checkpoint_every=every)

    def test_matches_single_device_mesh(self):
        """8-device run == 1-device run (same protocol, same batches; the
        only difference is the psum split)."""
        r8 = self._run(8)
        r1 = self._run(1)
        assert np.isfinite(r8.best_val) and np.isfinite(r8.test)
        np.testing.assert_allclose(r8.best_val, r1.best_val,
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            r8.perf_per_epoch, r1.perf_per_epoch, rtol=2e-3, atol=2e-3)

    def test_checkpoint_resume_under_mesh(self, tmp_path):
        """Kill after epoch 2, resume from the orbax checkpoint on the
        mesh: the resumed run reproduces the uninterrupted one."""
        full = self._run(8, n_epochs=4)
        _ = self._run(8, tmp=str(tmp_path / "ck"), n_epochs=2, every=1)
        resumed = self._run(8, tmp=str(tmp_path / "ck"), n_epochs=4,
                            every=1)
        np.testing.assert_allclose(
            resumed.perf_per_epoch, full.perf_per_epoch,
            rtol=2e-3, atol=2e-3)

    def test_ledger_under_mesh(self, tmp_path):
        """run_experiment_reg(mesh=...) routes through fit_dp and writes
        the same exp_history ledger record as the single-device path."""
        import json

        from geometric_message_passing_tpu.experiments.ledger import (
            append_result)
        from geometric_message_passing_tpu.experiments.train import (
            run_experiment_reg)
        from geometric_message_passing_tpu.graph import GraphLoader
        from geometric_message_passing_tpu.parallel import make_mesh

        tr, va, te = self._data()
        mesh = make_mesh((4,), ("dp",), devices=jax.devices()[:4])
        loaders = [GraphLoader(g, batch_size=8) for g in (tr, va, te)]
        bv, tm, times, mean, std = run_experiment_reg(
            lambda **kw: EGNNModel(num_layers=1, emb_dim=16, **kw),
            dict(in_dim=1, out_dim=1), *loaders,
            n_epochs=2, n_times=1, mesh=mesh)
        assert np.isfinite(mean)
        path = tmp_path / "hist.json"
        append_result(str(path), dict(model="egnn", mesh="dp4",
                                      test_acc=tm, mean=mean, std=std))
        rec = json.loads(path.read_text())
        assert rec[-1]["mesh"] == "dp4"


class TestHybridMesh:
    """Round-5 item 4b: the dcn x ici two-tier mesh layout executes."""

    def test_layout_and_collectives(self):
        from geometric_message_passing_tpu.parallel.mesh import (
            collectives, make_hybrid_mesh)

        mesh = make_hybrid_mesh(ici_shape=(1, 4), dcn_shape=(2, 1),
                                axis_names=("dp", "gp"))
        assert mesh.devices.shape == (2, 4)
        # pseudo-slices are contiguous device blocks (the dcn granule is
        # the slow tier; gp rides inside a granule)
        ids = np.asarray([[d.id for d in row] for row in mesh.devices])
        assert ids.tolist() == [[0, 1, 2, 3], [4, 5, 6, 7]]

        x = jnp.arange(8, dtype=jnp.float32).reshape(2, 4)

        def body(x):
            # per-device scalar; psum over gp (intra-slice) then dp
            local = x[0, 0]
            s_gp = collectives.all_reduce_sum(local, "gp")
            s_all = collectives.all_reduce_sum(s_gp, "dp")
            return s_gp[None, None], s_all[None, None]

        s_gp, s_all = jax.jit(shard_map(
            body, mesh=mesh, in_specs=P("dp", "gp"),
            out_specs=(P("dp", "gp"), P("dp", "gp")), check_vma=False))(x)
        # gp-sums differ per slice; the dp completion is global
        np.testing.assert_allclose(np.asarray(s_gp)[0, 0], 0 + 1 + 2 + 3)
        np.testing.assert_allclose(np.asarray(s_gp)[1, 0], 4 + 5 + 6 + 7)
        np.testing.assert_allclose(np.asarray(s_all), 28.0)

    def test_dp_across_slices_trains(self):
        """A dp step over the hybrid mesh's slow axis (the multi-slice DP
        layout the docstring prescribes) trains a real model."""
        from geometric_message_passing_tpu.experiments.dp_fit import fit_dp
        from geometric_message_passing_tpu.experiments.train import (
            seed_everything)
        from geometric_message_passing_tpu.graph import batch_graphs
        from geometric_message_passing_tpu.parallel.mesh import (
            make_hybrid_mesh)

        mesh = make_hybrid_mesh(ici_shape=(1,), dcn_shape=(2,),
                                axis_names=("dp",))
        graphs = ds.create_star_graphs(num=12, fold=[4], dim=3, seed=1)
        model = EGNNModel(num_layers=1, emb_dim=16, in_dim=1, out_dim=1)
        n_pad, e_pad, g_pad = pad_sizes(graphs, 2)
        init = batch_graphs(graphs[:2], n_pad, e_pad, g_pad)
        variables = model.init(seed_everything(0), init)
        res = fit_dp(model, variables, graphs[:8], graphs[8:10],
                     graphs[10:], n_epochs=2, mesh=mesh, batch_size=4,
                     lr=1e-3, seed=0)
        assert np.isfinite(res.best_val) and np.isfinite(res.test)


class TestGpBoxScale:
    """Round-5 item 5: gp on a REAL molecular box (spatial Morton
    partition -> real interior/boundary structure) on the CPU mesh."""

    K = 8

    def _box(self, n_nodes=800):
        from geometric_message_passing_tpu.parallel.partition import (
            morton_partition_graph)

        g = ds.create_molecular_boxes(
            num=1, n_nodes=n_nodes, cutoff=2.5, avg_degree=8,
            n_species=4, seed=0)[0]
        g = morton_partition_graph(g)
        n_pad, e_pad, g_pad = pad_sizes([g], 1)
        return batch_graphs([g], n_pad, e_pad, g_pad)

    def test_morton_partition_has_interior(self):
        """The Morton relabeling turns index blocks into spatial bricks:
        most edges must be interior (vs ~0 for the raw random order)."""
        from geometric_message_passing_tpu.parallel.partition import (
            partition_stats)

        g = ds.create_molecular_boxes(
            num=1, n_nodes=4000, cutoff=2.5, avg_degree=8,
            n_species=4, seed=0)[0]
        raw = partition_stats(g.edge_index[0], g.edge_index[1],
                              (g.num_nodes + 7) // 8 * 8, self.K)
        from geometric_message_passing_tpu.parallel.partition import (
            morton_partition_graph)

        gm = morton_partition_graph(g)
        mor = partition_stats(gm.edge_index[0], gm.edge_index[1],
                              (gm.num_nodes + 7) // 8 * 8, self.K)
        assert mor["boundary_fraction"] < 0.35
        assert mor["boundary_fraction"] < raw["boundary_fraction"] / 2

    def test_permute_preserves_graph(self):
        """Node relabeling is a graph isomorphism: same edge set as
        geometric pairs, same multiset of species/positions."""
        from geometric_message_passing_tpu.parallel.partition import (
            morton_partition_graph)

        g = ds.create_molecular_boxes(num=1, n_nodes=300, cutoff=2.5,
                                      avg_degree=8, n_species=4, seed=1)[0]
        gm = morton_partition_graph(g)
        def edge_geoms(gr):
            s, r = gr.edge_index
            return set(map(tuple, np.round(
                np.concatenate([gr.pos[s], gr.pos[r]], 1), 5).tolist()))
        assert edge_geoms(g) == edge_geoms(gm)
        assert sorted(g.atoms.tolist()) == sorted(gm.atoms.tolist())

    def test_gp_mace_box_matches_single_device(self):
        """MACEForceField edge-partitioned over the Morton-bricked box ==
        the single-device forward; the halo accounting shows a real
        interior (packed win at locality)."""
        from geometric_message_passing_tpu.graph import GraphBatch
        from geometric_message_passing_tpu.models.mace_ff import (
            MACEForceField)
        from geometric_message_passing_tpu.parallel.halo import (
            build_halo_plan, gp_local_batch, halo_stats)

        big = self._box()
        k = self.K
        model = MACEForceField(num_layers=2, emb_dim=4, max_ell=2,
                               correlation=2, in_dim=4, node_chunk=None,
                               avg_num_neighbors=8.0)
        variables = model.init(jax.random.PRNGKey(0), big)
        ref = np.asarray(model.apply(variables, big))

        plan = build_halo_plan(
            np.asarray(big.senders), np.asarray(big.receivers),
            big.num_nodes, k, edge_mask=np.asarray(big.edge_mask))
        local = gp_local_batch(big, plan)
        plan_arrays = {"send_idx": plan.send_idx,
                       "send_mask": plan.send_mask}
        gp_model = model.clone(gp_axis="gp")
        mesh = make_mesh((k,), ("gp",))
        batch_spec = GraphBatch(
            atoms=P("gp"), pos=P("gp"), senders=P("gp"), receivers=P("gp"),
            graph_id=P("gp"), y=P(), node_mask=P("gp"), edge_mask=P("gp"),
            graph_mask=P(), first_node=P(), triplets=None)
        out = np.asarray(jax.jit(shard_map(
            lambda v, b, pl: gp_model.apply(v, b, halo_plan=pl),
            mesh=mesh, in_specs=(P(), batch_spec, P("gp")),
            out_specs=P(), check_vma=False))(variables, local, plan_arrays))
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)

        st = halo_stats(plan, payload_dim=4 * (1 + 3 + 5),
                        num_nodes=big.num_nodes)
        # at box locality the packed exchange must beat the all-gather
        assert st["wire_bytes"] < st["allgather_bytes"]

    def test_overlapped_halo_on_box(self):
        """packed_halo_aggregate_overlapped over the box (real interior:
        the overlap path finally has interior work to hide) == local
        segment_sum."""
        from geometric_message_passing_tpu.parallel.halo import (
            build_halo_plan, packed_halo_aggregate_overlapped)

        big = self._box(n_nodes=640)
        k = self.K
        n = big.num_nodes
        rng = np.random.default_rng(0)
        h = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
        plan = build_halo_plan(
            np.asarray(big.senders), np.asarray(big.receivers), n, k,
            edge_mask=np.asarray(big.edge_mask))
        assert int(jnp.sum(plan.int_mask)) > int(jnp.sum(plan.bnd_mask)), \
            "box partition must be interior-dominated"

        def message_fn(h_tgt, h_src):
            return 0.5 * h_tgt + h_src

        mesh = make_mesh((k,), ("gp",))
        out = jax.jit(shard_map(
            lambda hl, pl: packed_halo_aggregate_overlapped(
                hl, pl, message_fn, axis="gp"),
            mesh=mesh,
            in_specs=(P("gp"), P("gp")), out_specs=P("gp"),
            check_vma=False))(
                h.reshape(k, n // k, -1).reshape(n, -1),
                jax.tree.map(
                    lambda x: x, {
                        f: getattr(plan, f) for f in (
                            "send_idx", "send_mask", "int_src", "int_tgt",
                            "int_mask", "bnd_src_slot", "bnd_tgt",
                            "bnd_mask")}))
        s, r = np.asarray(big.senders), np.asarray(big.receivers)
        m = np.asarray(big.edge_mask)
        ref = np.asarray(segment_sum(
            message_fn(h[r], h[s]), jnp.asarray(r), n, mask=jnp.asarray(m)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4,
                                   rtol=2e-4)
