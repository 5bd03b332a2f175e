"""Full EXPERIMENT under a device mesh — round-5 VERDICT item 4.

Every parallel strategy was exactness-tested at the STEP level
(tests/test_parallel.py); this engine runs the production experiment
protocol — per-epoch shuffles, LR scheduling (cosine / plateau), the
best-val test rule, orbax checkpoint/resume, the ledger record — with the
train/eval steps executed data-parallel over a ``jax.sharding.Mesh``
(shard_map + psum, parallel/data.py), so the scheduler state, checkpoint
restore, and metric reductions are all exercised UNDER sharding.

Exactness contract: with the same seed, ``fit_dp`` over an n-device mesh
reproduces the 1-device-mesh run (same batch composition: a global batch
of B graphs is deterministically split into per-device shards; sum-losses
psum to the same totals up to fp reassociation).  Tested on the 8-virtual-
device CPU mesh in tests/test_parallel.py::TestFitDP, including a killed-
and-resumed checkpoint run.

The reference has no distributed training at all (SURVEY §2.5); the
experiment protocol mirrored here is its graph_angle_prediction.py loop
(/root/reference/experiments/train_utils.py:101-175).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph import batch_graphs, pad_sizes
from ..parallel.data import dp_train_step, shard_batches
from ..parallel.mesh import collectives
from .train import (FitResult, PlateauConfig, l1_sum_loss, make_tx)


def dp_eval_step(model, mesh: Mesh, axis: str = "dp"):
    """Sharded evaluation: each device sums |pred - y| over its shard's
    real graphs; one psum completes the global sum.  Returns
    eval(variables, sharded_batch) -> (err_sum, n_graphs)."""

    def per_device(variables, batch):
        batch = jax.tree.map(lambda x: x[0], batch)
        pred = model.apply(variables, batch)
        err = jnp.sum(jnp.abs(pred - batch.y) * batch.graph_mask[:, None])
        cnt = jnp.sum(batch.graph_mask)
        return (collectives.all_reduce_sum(err, axis),
                collectives.all_reduce_sum(cnt, axis))

    mapped = shard_map(per_device, mesh=mesh,
                       in_specs=(P(), P(axis)), out_specs=(P(), P()),
                       check_vma=False)
    return jax.jit(mapped)


def _epoch_batches(graphs: Sequence, order, batch_size: int, n_dev: int,
                   n_pad: int, e_pad: int, g_pad: int):
    """Deterministic global batches -> per-device shard stacks (mesh-size-
    independent COMPOSITION: the shuffled order and the batch windows do
    not depend on n_dev; only the split into shards does)."""
    out = []
    for s in range(0, len(order), batch_size):
        window = [graphs[i] for i in order[s : s + batch_size]]
        out.append(shard_batches(window, n_dev, n_pad, e_pad, g_pad))
    return out


def fit_dp(model, variables, train_graphs, val_graphs, test_graphs,
           n_epochs: int, mesh: Mesh, axis: str = "dp",
           batch_size: int = 8, lr: float = 1e-4, cosine: bool = False,
           plateau: Optional[PlateauConfig] = None, seed: int = 0,
           checkpoint_dir: Optional[str] = None,
           checkpoint_every: int = 0) -> FitResult:
    """Regression experiment (MAE metric, best-val test rule) with every
    device step sharded over ``mesh``.  See module docstring."""
    n_dev = mesh.devices.size
    if batch_size % n_dev:
        raise ValueError(f"batch_size {batch_size} must be divisible by "
                         f"mesh size {n_dev}")
    per_shard = batch_size // n_dev
    all_graphs = list(train_graphs) + list(val_graphs) + list(test_graphs)
    n_pad, e_pad, g_pad = pad_sizes(all_graphs, per_shard)

    tx = make_tx(lr)
    opt_state = tx.init(variables["params"])
    step_fn = dp_train_step(model, tx, mesh, l1_sum_loss, axis=axis)
    eval_fn = dp_eval_step(model, mesh, axis=axis)

    val_batches = _epoch_batches(
        val_graphs, np.arange(len(val_graphs)), batch_size, n_dev,
        n_pad, e_pad, g_pad)
    test_batches = _epoch_batches(
        test_graphs, np.arange(len(test_graphs)), batch_size, n_dev,
        n_pad, e_pad, g_pad)

    def evaluate(variables, batches):
        tot = cnt = 0.0
        for b in batches:
            e, c = eval_fn(
                {k: v for k, v in variables.items() if k != "opt"}, b)
            tot += float(e)
            cnt += float(c)
        return tot / max(cnt, 1.0)

    # host-side scheduler/protocol state (identical to fit_stepwise)
    lr_now, sched_best, sched_bad = float(lr), -float("inf"), 0
    best_val, test_metric = float("inf"), 0.0
    per_epoch = []
    start_epoch = 0
    mgr = None
    if checkpoint_dir:
        from flax import serialization

        from ..utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir, max_to_keep=2)
        if mgr.latest_step is not None:
            restored = mgr.restore()["variables"]
            variables = {**variables,
                         **jax.tree.map(jnp.asarray, restored["variables"])}
            opt_state = serialization.from_state_dict(
                opt_state, restored["opt_state"])
            h = restored["host"]
            lr_now, sched_best = float(h["lr_now"]), float(h["sched_best"])
            sched_bad = int(h["sched_bad"])
            best_val = float(h["best_val"])
            test_metric = float(h["test_metric"])
            start_epoch = int(mgr.latest_step) + 1
            per_epoch = [tuple(r) for r in
                         np.asarray(restored["per_epoch"])[:start_epoch]]

    t0 = time.time()
    for epoch in range(start_epoch, n_epochs):
        if cosine:
            from .train import cosine_lr

            lr_now = float(cosine_lr(lr, 1e-6, n_epochs, epoch))
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr_now, jnp.float32)
        order = np.random.default_rng(
            np.random.SeedSequence([seed, epoch])).permutation(
                len(train_graphs))
        for k, sb in enumerate(_epoch_batches(
                train_graphs, order, batch_size, n_dev,
                n_pad, e_pad, g_pad)):
            rng = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(seed), epoch), k)
            variables, opt_state, _ = step_fn(variables, opt_state, sb, rng)
        val_metric = evaluate(variables, val_batches)
        if val_metric <= best_val:
            best_val = val_metric
            test_metric = evaluate(variables, test_batches)
        if not cosine and plateau is not None:
            signed = val_metric if plateau.mode == "max" else -val_metric
            dynamic = (sched_best * (1 + plateau.threshold)
                       if sched_best >= 0
                       else sched_best * (1 - plateau.threshold))
            improved = signed > dynamic
            sched_bad = 0 if improved else sched_bad + 1
            if improved:
                sched_best = signed
            if sched_bad > plateau.patience:
                lr_now = max(lr_now * plateau.factor, plateau.min_lr)
                sched_bad = 0
        per_epoch.append((test_metric, val_metric))
        if mgr is not None and checkpoint_every and \
                (epoch + 1) % checkpoint_every == 0:
            from flax import serialization

            pe = np.zeros((n_epochs, 2), np.float32)
            pe[: epoch + 1] = np.asarray(per_epoch, np.float32)
            mgr.save(epoch, {
                "variables": {k: v for k, v in variables.items() if v},
                "opt_state": serialization.to_state_dict(opt_state),
                "host": dict(
                    lr_now=np.asarray(lr_now, np.float64),
                    sched_best=np.asarray(sched_best, np.float64),
                    sched_bad=np.asarray(sched_bad, np.int64),
                    best_val=np.asarray(best_val, np.float64),
                    test_metric=np.asarray(test_metric, np.float64),
                ),
                "per_epoch": pe,
            })
    if mgr is not None:
        mgr.close()
    jax.block_until_ready(variables)
    return FitResult(
        best_val=best_val, test=test_metric,
        train_time=time.time() - t0,
        perf_per_epoch=np.asarray(per_epoch), variables=variables,
    )
