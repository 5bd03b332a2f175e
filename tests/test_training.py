"""End-to-end training smoke tests + expressivity behavior checks.

The k-chains / rotsym outcomes are the reference's behavioral test suite
(SURVEY §4 / BASELINE.md): correctness is defined by which models CAN solve
which synthetic task.
"""

import numpy as np
import pytest

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.experiments import (
    fit_classification,
    fit_regression,
    run_experiment,
)
from geometric_message_passing_tpu.experiments.train import seed_everything
from geometric_message_passing_tpu.graph import GraphLoader, random_split
from geometric_message_passing_tpu.models import EGNNModel, MPNNModel, model_registry


def test_regression_learns_star_angles():
    """EGNN on the star max-angle task must beat the trivial predictor
    within a few epochs (sanity that gradients flow end to end)."""
    data = ds.create_star_graphs(num=60, fold=[4], dim=3, seed=0)
    tr, va, te = random_split(data, [0.5, 0.2, 0.3], seed=0)
    kw = dict(batch_size=20)
    tr_l = GraphLoader(tr, shuffle=True, seed=0, **kw)
    va_l = GraphLoader(va, **kw)
    te_l = GraphLoader(te, **kw)
    model = EGNNModel(num_layers=2, emb_dim=32, in_dim=1, out_dim=1, pool="first")
    variables = model.init(seed_everything(0), next(iter(tr_l)))
    res = fit_regression(model, variables, tr_l, va_l, te_l, n_epochs=40,
                         lr=5e-4)
    ys = np.concatenate([g.y for g in tr])
    trivial = np.abs(ys - ys.mean()).mean()
    assert res.best_val < trivial, (res.best_val, trivial)
    # learning happened: early-epoch val MAE is much worse than final
    assert res.perf_per_epoch[0, 1] > 1.5 * res.best_val


def test_kchains_depth_requirement():
    """k-chains (k=4): a geometric model with >= k/2+1 layers separates the
    pair; a position-blind MPNN never can (the two chains are isomorphic with
    identical edge lengths — only angles differ).  Like the reference
    protocol (kchains.ipynb cells 2-4: run_experiment over n_times seeds,
    best-val checkpointing), success is statistical over seeds — the sharp
    claim is separability: SOME seed reaches 100% with geometry, NO seed
    ever exceeds 50% without it."""
    k = 4
    data = ds.create_kchains(k)
    loader = GraphLoader(data, batch_size=2, y_dtype=np.int32)

    def accs(model, seeds=(0, 1, 2, 3, 4), n_epochs=400):
        out = []
        for seed in seeds:
            variables = model.init(seed_everything(seed), next(iter(loader)))
            res = fit_classification(
                model, variables, loader, loader, loader, n_epochs=n_epochs,
                lr=1e-3, seed=seed,
            )
            out.append(res.test)
        return out

    # EGNN with k//2+1 layers: both ends reach the center -> separable
    egnn = EGNNModel(num_layers=k // 2 + 1, emb_dim=32, in_dim=1, out_dim=2)
    egnn_accs = accs(egnn)
    assert max(egnn_accs) == 100.0, egnn_accs
    assert np.mean(egnn_accs) > 50.0, egnn_accs
    # position-blind MPNN cannot separate them at any depth, ever
    mpnn = MPNNModel(num_layers=k // 2 + 1, emb_dim=32, in_dim=1, out_dim=2)
    mpnn_accs = accs(mpnn, seeds=(0, 1, 2))
    assert max(mpnn_accs) <= 50.0, mpnn_accs


@pytest.mark.parametrize("name,should_solve", [("egnn", False), ("tfn", True)])
def test_rotsym_expressivity(name, should_solve):
    """rotsym fold=3, 1 layer, equivariant_pred: cartesian-vector models
    (EGNN) fail at 50%; spherical-tensor models (TFN, max_ell >= fold)
    succeed. (rotsym.ipynb cells 2-4; BASELINE.md)."""
    fold = 3
    data = ds.create_rotsym_envs(fold=fold)
    loader = GraphLoader(data, batch_size=2, y_dtype=np.int32)
    if name == "egnn":
        model = model_registry[name](
            num_layers=1, emb_dim=32, in_dim=1, out_dim=2,
            equivariant_pred=True, pool="sum",
        )
    else:
        # pool="first" (TFN's default): the center node carries the l=fold
        # signature; under sum pooling the odd-l contributions of center and
        # spokes cancel exactly.
        model = model_registry[name](
            num_layers=1, emb_dim=8, max_ell=fold, mlp_dim=32, in_dim=1,
            out_dim=2, equivariant_pred=True, pool="first", gate=False,
        )
    variables = model.init(seed_everything(0), next(iter(loader)))
    res = fit_classification(model, variables, loader, loader, loader,
                             n_epochs=150, lr=1e-3, seed=0)
    if should_solve:
        assert res.test == 100.0
    else:
        assert res.test <= 50.0


def test_classification_repeat_protocol_reuses_params():
    data = ds.create_kchains(2)
    loader = GraphLoader(data, batch_size=2, y_dtype=np.int32)
    model = MPNNModel(num_layers=2, emb_dim=16, in_dim=1, out_dim=2)
    bv, ta, times = run_experiment(model, loader, loader, loader, n_epochs=5,
                                   n_times=2)
    assert len(ta) == 2


def test_slot_assembly_matches_blockdiagonal_batching():
    """Device-side slot batch assembly (graph.SlotData/assemble_batch) gives
    the same per-graph model outputs as host block-diagonal batch_graphs —
    pad nodes/edges land in different places, so this exercises the masking
    discipline end-to-end."""
    import jax
    import jax.numpy as jnp

    from geometric_message_passing_tpu.graph import (
        assemble_batch,
        batch_graphs,
        build_slot_data,
        pad_sizes,
    )

    graphs = ds.create_star_graphs(num=12, fold=[3, 4, 5], dim=3,
                                   target="max", seed=3)
    n_pad, e_pad, g_pad = pad_sizes(graphs, 12)
    ref_batch = batch_graphs(graphs, n_pad, e_pad, g_pad)
    slot = build_slot_data(graphs)
    slot_batch = assemble_batch(slot, jnp.arange(12, dtype=jnp.int32))

    model = EGNNModel(num_layers=2, emb_dim=32, in_dim=1, out_dim=1,
                      pool="first")
    variables = model.init(seed_everything(0), ref_batch)
    out_ref = model.apply(variables, ref_batch)
    out_slot = model.apply(variables, slot_batch)
    np.testing.assert_allclose(np.asarray(out_ref[:12]),
                               np.asarray(out_slot[:12]), atol=1e-5)
    # partial batch with sentinel padding
    part = assemble_batch(slot, jnp.asarray([3, 7, 12, 12], jnp.int32))
    out_part = model.apply(variables, part)
    np.testing.assert_allclose(np.asarray(out_part[0]),
                               np.asarray(out_ref[3]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_part[1]),
                               np.asarray(out_ref[7]), atol=1e-5)
    assert not bool(part.graph_mask[2]) and not bool(part.graph_mask[3])


def test_slot_assembly_triplets_match_blockdiagonal():
    """Slotted triplet indices (DimeNet/SphereNet path) give the same model
    outputs as the host block-diagonal batching."""
    import jax.numpy as jnp

    from geometric_message_passing_tpu.graph import (
        GraphLoader, assemble_batch, build_slot_data)
    from geometric_message_passing_tpu.models import (
        DimeNetPPModel, SphereNetModel)

    graphs = ds.create_star_graphs(num=6, fold=[3, 4], dim=3,
                                   target="max", seed=5)
    loader = GraphLoader(graphs, batch_size=6, with_quads=True)
    ref_batch = next(iter(loader))
    slot = build_slot_data(graphs, with_triplets=True, with_quads=True)
    slot_batch = assemble_batch(slot, jnp.arange(6, dtype=jnp.int32))
    assert slot_batch.triplets is not None

    for model in (
        DimeNetPPModel(num_layers=2, hidden_channels=16, in_dim=1,
                       out_dim=1, num_spherical=3, num_radial=4,
                       out_emb_channels=16),
        SphereNetModel(num_layers=1, hidden_channels=16, in_dim=1, out_dim=1,
                       num_spherical=3, num_radial=4, out_emb_channels=16),
    ):
        variables = model.init(seed_everything(0), ref_batch)
        out_ref = model.apply(variables, ref_batch)
        out_slot = model.apply(variables, slot_batch)
        np.testing.assert_allclose(np.asarray(out_ref[:6]),
                                   np.asarray(out_slot[:6]),
                                   rtol=1e-4, atol=1e-4)


def test_stepwise_engine_matches_monolith():
    """fit_stepwise (host epoch loop over small programs, used for
    heavyweight models whose monolithic program compiles too slowly) must
    reproduce fit_resident exactly: same shuffle stream, plateau rule, and
    best-val/test protocol."""
    from geometric_message_passing_tpu.experiments.train import (
        PlateauConfig, fit_resident, fit_stepwise, init_variables,
        tiny_init_batch)
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes

    data = ds.create_star_graphs(num=60, fold=[3, 4], dim=3, target="max",
                                 seed=7)
    tr, va, te = random_split(data, [0.5, 0.2, 0.3], seed=0)
    pad = pad_sizes(data, 10)
    kw = dict(batch_size=10, pad=pad)
    tr_l = GraphLoader(tr, shuffle=True, seed=0, **kw)
    va_l, te_l = GraphLoader(va, **kw), GraphLoader(te, **kw)
    model = EGNNModel(num_layers=2, emb_dim=32, in_dim=1, out_dim=1,
                      pool="first")
    variables = init_variables(model, seed_everything(0), tiny_init_batch(tr_l))
    plateau = PlateauConfig(mode="max", factor=0.9, patience=15, min_lr=1e-4)
    args = dict(n_epochs=8, lr=5e-4, task="regression", cosine=False,
                plateau=plateau, seed=3)
    r1 = fit_resident(model, variables, tr_l, va_l, te_l, **args)
    r2 = fit_stepwise(model, variables, tr_l, va_l, te_l, **args)
    assert abs(r1.best_val - r2.best_val) < 1e-5, (r1.best_val, r2.best_val)
    assert abs(r1.test - r2.test) < 1e-5, (r1.test, r2.test)

    # chunked resident execution (bounds single device-call time on the TPU
    # tunnel) must reproduce the one-call monolith exactly — including a
    # remainder chunk (8 = 3+3+2) and the carried plateau/best-val state
    r3 = fit_resident(model, variables, tr_l, va_l, te_l, epoch_chunk=3,
                      **args)
    np.testing.assert_allclose(r3.perf_per_epoch, r1.perf_per_epoch,
                               rtol=0, atol=1e-6)
    assert abs(r3.best_val - r1.best_val) < 1e-6
    assert abs(r3.test - r1.test) < 1e-6


def test_stepwise_checkpoint_resume(tmp_path):
    """Kill-and-resume: training with periodic checkpoints, restarted from
    the latest checkpoint, reproduces the uninterrupted run exactly."""
    from geometric_message_passing_tpu.experiments.train import (
        PlateauConfig, fit_stepwise, init_variables, tiny_init_batch)
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes

    data = ds.create_star_graphs(num=40, fold=[3, 4], dim=3, target="max",
                                 seed=9)
    tr, va, te = random_split(data, [0.5, 0.2, 0.3], seed=0)
    pad = pad_sizes(data, 10)
    kw = dict(batch_size=10, pad=pad)
    tr_l = GraphLoader(tr, shuffle=True, seed=0, **kw)
    va_l, te_l = GraphLoader(va, **kw), GraphLoader(te, **kw)
    model = EGNNModel(num_layers=1, emb_dim=16, in_dim=1, out_dim=1)
    variables = init_variables(model, seed_everything(0), tiny_init_batch(tr_l))
    plateau = PlateauConfig(mode="max", factor=0.9, patience=2, min_lr=1e-4)
    args = dict(n_epochs=6, lr=5e-4, task="regression", cosine=False,
                plateau=plateau, seed=1)

    full = fit_stepwise(model, variables, tr_l, va_l, te_l, **args)

    ckdir = str(tmp_path / "ck")
    # "crash" after 3 epochs: run with checkpointing but n_epochs=3
    fit_stepwise(model, variables, tr_l, va_l, te_l,
                 n_epochs=3, lr=5e-4, task="regression", cosine=False,
                 plateau=plateau, seed=1,
                 checkpoint_dir=ckdir, checkpoint_every=1)
    # resume to 6 epochs from the same directory
    resumed = fit_stepwise(model, variables, tr_l, va_l, te_l,
                           checkpoint_dir=ckdir, checkpoint_every=1, **args)
    assert abs(full.best_val - resumed.best_val) < 1e-5
    assert abs(full.test - resumed.test) < 1e-5


def test_stepwise_nan_recovery(tmp_path):
    """Failure detection: a fault injected mid-run (params poisoned to NaN)
    is detected from the non-finite epoch loss, rolled back to the latest
    checkpoint, and the run completes with the same result as an
    un-faulted run."""
    import jax
    import jax.numpy as jnp

    from geometric_message_passing_tpu.experiments.train import (
        fit_stepwise, init_variables, tiny_init_batch)
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes

    data = ds.create_star_graphs(num=40, fold=[3, 4], dim=3, target="max",
                                 seed=9)
    tr, va, te = random_split(data, [0.5, 0.2, 0.3], seed=0)
    pad = pad_sizes(data, 10)
    kw = dict(batch_size=10, pad=pad)
    tr_l = GraphLoader(tr, shuffle=True, seed=0, **kw)
    va_l, te_l = GraphLoader(va, **kw), GraphLoader(te, **kw)
    model = EGNNModel(num_layers=1, emb_dim=16, in_dim=1, out_dim=1)
    variables = init_variables(model, seed_everything(0), tiny_init_batch(tr_l))
    args = dict(n_epochs=6, lr=5e-4, task="regression", cosine=True, seed=1)

    clean = fit_stepwise(model, variables, tr_l, va_l, te_l, **args,
                         checkpoint_dir=str(tmp_path / "a"),
                         checkpoint_every=1)

    fired = []

    def poison(epoch, vs):
        if epoch == 4 and not fired:
            fired.append(epoch)
            return jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), vs)
        return vs

    faulted = fit_stepwise(model, variables, tr_l, va_l, te_l, **args,
                           checkpoint_dir=str(tmp_path / "b"),
                           checkpoint_every=1, nan_recovery=True,
                           inject_fault=poison)
    assert fired == [4]
    assert abs(clean.best_val - faulted.best_val) < 1e-5
    assert abs(clean.test - faulted.test) < 1e-5

    # unrecoverable: fault fires every epoch -> raises after max_recoveries
    with pytest.raises(FloatingPointError):
        fit_stepwise(model, variables, tr_l, va_l, te_l, **args,
                     checkpoint_dir=str(tmp_path / "c"), checkpoint_every=1,
                     nan_recovery=True, max_recoveries=2,
                     inject_fault=lambda e, vs: jax.tree.map(
                         lambda x: jnp.full_like(x, jnp.nan), vs))


def test_resident_checkpoint_resume_bitwise(tmp_path):
    """Round-3: fault tolerance on the PRODUCTION (resident) engine.
    Kill-and-resume at a chunk boundary reproduces the uninterrupted run
    bitwise (same shuffle stream — derived from (key, epoch) — and the
    dropout rng rides the saved carry); checkpointing itself must not
    perturb numerics either."""
    from geometric_message_passing_tpu.experiments.train import (
        PlateauConfig, fit_resident, init_variables, tiny_init_batch)
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes

    data = ds.create_star_graphs(num=40, fold=[3, 4], dim=3, target="max",
                                 seed=9)
    tr, va, te = random_split(data, [0.5, 0.2, 0.3], seed=0)
    pad = pad_sizes(data, 10)
    kw = dict(batch_size=10, pad=pad)
    tr_l = GraphLoader(tr, shuffle=True, seed=0, **kw)
    va_l, te_l = GraphLoader(va, **kw), GraphLoader(te, **kw)
    model = EGNNModel(num_layers=1, emb_dim=16, in_dim=1, out_dim=1)
    variables = init_variables(model, seed_everything(0), tiny_init_batch(tr_l))
    plateau = PlateauConfig(mode="max", factor=0.9, patience=2, min_lr=1e-4)
    args = dict(n_epochs=6, lr=5e-4, task="regression", cosine=False,
                plateau=plateau, seed=1, epoch_chunk=4)

    full = fit_resident(model, variables, tr_l, va_l, te_l, **args)

    ckdir = str(tmp_path / "ck")
    # "crash" after 4 epochs: run with checkpointing but n_epochs=4
    partial_args = dict(args, n_epochs=4)
    fit_resident(model, variables, tr_l, va_l, te_l,
                 checkpoint_dir=ckdir, checkpoint_every=2, **partial_args)
    # resume to 6 epochs from the same directory
    resumed = fit_resident(model, variables, tr_l, va_l, te_l,
                           checkpoint_dir=ckdir, checkpoint_every=2, **args)
    np.testing.assert_array_equal(resumed.perf_per_epoch,
                                  full.perf_per_epoch)
    assert resumed.best_val == full.best_val
    assert resumed.test == full.test


def test_resident_nan_recovery(tmp_path):
    """NaN watchdog on the resident engine: a fault injected at a chunk
    start is detected from the non-finite chunk losses, rolled back to the
    latest checkpoint, and the run finishes with the un-faulted result."""
    import jax
    import jax.numpy as jnp

    from geometric_message_passing_tpu.experiments.train import (
        fit_resident, init_variables, tiny_init_batch)
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes

    data = ds.create_star_graphs(num=40, fold=[3, 4], dim=3, target="max",
                                 seed=9)
    tr, va, te = random_split(data, [0.5, 0.2, 0.3], seed=0)
    pad = pad_sizes(data, 10)
    kw = dict(batch_size=10, pad=pad)
    tr_l = GraphLoader(tr, shuffle=True, seed=0, **kw)
    va_l, te_l = GraphLoader(va, **kw), GraphLoader(te, **kw)
    model = EGNNModel(num_layers=1, emb_dim=16, in_dim=1, out_dim=1)
    variables = init_variables(model, seed_everything(0), tiny_init_batch(tr_l))
    args = dict(n_epochs=6, lr=5e-4, task="regression", cosine=True, seed=1,
                epoch_chunk=2)

    clean = fit_resident(model, variables, tr_l, va_l, te_l, **args,
                         checkpoint_dir=str(tmp_path / "a"),
                         checkpoint_every=2)

    fired = []

    def poison(epoch, vs):
        if epoch == 4 and not fired:
            fired.append(epoch)
            return jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), vs)
        return vs

    faulted = fit_resident(model, variables, tr_l, va_l, te_l, **args,
                           checkpoint_dir=str(tmp_path / "b"),
                           checkpoint_every=2, nan_recovery=True,
                           inject_fault=poison)
    assert fired == [4]
    assert faulted.best_val == clean.best_val
    assert faulted.test == clean.test
    np.testing.assert_array_equal(faulted.perf_per_epoch,
                                  clean.perf_per_epoch)

    # unrecoverable: fault fires every chunk -> raises after max_recoveries
    with pytest.raises(FloatingPointError):
        fit_resident(model, variables, tr_l, va_l, te_l, **args,
                     checkpoint_dir=str(tmp_path / "c"), checkpoint_every=2,
                     nan_recovery=True, max_recoveries=2,
                     inject_fault=lambda e, vs: jax.tree.map(
                         lambda x: jnp.full_like(x, jnp.nan), vs))


def test_repeat_protocol_checkpoint_threading(tmp_path):
    """run_experiment_reg(checkpoint_dir=...) gives each repeat its own
    checkpoint subdirectory on the fault-tolerant (resident, round-3)
    engine; a re-invocation with the same dir resumes (runs stay finite and
    reproduce the first invocation's metrics)."""
    from geometric_message_passing_tpu.experiments.train import (
        run_experiment_reg)
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes
    from geometric_message_passing_tpu.models import EGNNModel

    data = ds.create_star_graphs(num=40, fold=[3, 4], dim=3, target="max",
                                 seed=9)
    tr, va, te = random_split(data, [0.5, 0.2, 0.3], seed=0)
    pad = pad_sizes(data, 10)
    kw = dict(batch_size=10, pad=pad)
    tr_l = GraphLoader(tr, shuffle=True, seed=0, **kw)
    va_l, te_l = GraphLoader(va, **kw), GraphLoader(te, **kw)
    ckdir = str(tmp_path / "ck")
    args = dict(model_args=dict(num_layers=1, emb_dim=16, in_dim=1,
                                out_dim=1),
                n_epochs=3, n_times=2, lr=5e-4,
                checkpoint_dir=ckdir, checkpoint_every=1)

    *_, mean, std = run_experiment_reg(EGNNModel, train_loader=tr_l,
                                       val_loader=va_l, test_loader=te_l,
                                       **args)
    assert np.isfinite(mean) and np.isfinite(std)
    assert (tmp_path / "ck" / "run0").is_dir()
    assert (tmp_path / "ck" / "run1").is_dir()

    # re-run with the same dir: every repeat resumes from its final
    # checkpoint and must reproduce the metrics exactly
    *_, mean2, std2 = run_experiment_reg(EGNNModel, train_loader=tr_l,
                                         val_loader=va_l, test_loader=te_l,
                                         **args)
    assert abs(mean2 - mean) < 1e-6 and abs(std2 - std) < 1e-6


@pytest.mark.parametrize("name", ["egnn", "schnet", "gvp", "tfn", "mace",
                                  "dimenet", "spherenet"])
def test_every_model_trains_through_engine(name):
    """2-epoch smoke: every zoo model runs through its fit engine (resident
    monolith or stepwise) without error and returns finite metrics."""
    from geometric_message_passing_tpu.experiments.train import (
        fit_regression, init_variables, seed_everything, tiny_init_batch)
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes
    from geometric_message_passing_tpu.models import model_registry

    data = ds.create_star_graphs(num=30, fold=[3, 4], dim=3, target="max",
                                 seed=11)
    tr, va, te = random_split(data, [0.5, 0.2, 0.3], seed=0)
    needs_tri = name in ("dimenet", "spherenet")
    needs_quads = name == "spherenet"
    pad = pad_sizes(data, 10)
    kw = dict(batch_size=10, pad=pad, with_triplets=needs_tri,
              with_quads=needs_quads)
    tr_l = GraphLoader(tr, shuffle=True, seed=0, **kw)
    va_l, te_l = GraphLoader(va, **kw), GraphLoader(te, **kw)

    base = model_registry[name]
    small = dict(num_layers=1, in_dim=1, out_dim=1)
    if name in ("egnn", "tfn", "mace"):
        small["emb_dim"] = 16
    if name == "gvp":
        small.update(s_dim=16, v_dim=4, s_dim_edge=8)
    if name == "mace":
        small.update(max_ell=2, correlation=2)
    if name in ("dimenet", "spherenet"):
        small.update(hidden_channels=16, num_spherical=3, num_radial=4,
                     out_emb_channels=16)
    if name == "schnet":
        small.update(hidden_channels=16, num_filters=16, num_gaussians=8)
    model = base(**small)
    v = init_variables(model, seed_everything(0), tiny_init_batch(tr_l))
    res = fit_regression(model, v, tr_l, va_l, te_l, n_epochs=2, lr=1e-3,
                         seed=0)
    assert np.isfinite(res.test) and np.isfinite(res.best_val), (name, res)
