"""Data-parallel training over graph shards.

The reference's only batch parallelism is PyG block-diagonal batching
(SURVEY §2.5).  Here a global batch is split into per-device sub-batches
(identical padded shapes), stacked on a leading mesh axis, and the train step
runs under ``shard_map``: each device computes loss/grads for its shard and
gradients are ``psum``-ed over the dp axis — the classic DP recipe, riding
ICI via XLA collectives.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..graph import GraphBatch, batch_graphs
from .mesh import collectives


def shard_batches(graphs: Sequence, num_shards: int, n_pad: int, e_pad: int,
                  g_pad: int) -> GraphBatch:
    """Split ``graphs`` into ``num_shards`` groups, pad each identically, and
    stack on a leading [dp] axis ready to place on the mesh."""
    shards = []
    per = (len(graphs) + num_shards - 1) // num_shards
    for s in range(num_shards):
        chunk = graphs[s * per : (s + 1) * per]
        shards.append(batch_graphs(chunk, n_pad, e_pad, g_pad))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *shards)


def dp_train_step_autoshard(model, tx, mesh: Mesh, loss_fn: Callable,
                            axis: str = "dp"):
    """Auto-partitioned (pjit-style) data-parallel train step.

    The alternative SPMD idiom to ``dp_train_step``'s explicit shard_map:
    the step is written as the plain single-program math over ONE big
    block-diagonal ``GraphBatch`` whose node/edge/graph axes are sharded over
    the mesh via ``NamedSharding`` annotations, and XLA's SPMD partitioner
    inserts the collectives (gather halos for cross-shard ``pos[senders]``,
    the gradient all-reduce) itself — the "annotate shardings, let XLA do
    the rest" recipe.  Exact same numerics as the single-device step.

    Requires every batch leaf's leading axis divisible by the mesh size
    (``pad_sizes`` bucket x n_dev; ``batch_graphs`` with scaled buckets).

    The optional ``rng`` arg seeds dropout; thread a fresh per-step key
    (e.g. ``jax.random.fold_in(base, step_no)``) for models with dropout.
    """

    def step(variables, opt_state, batch, rng):
        def loss_of(params):
            vs = {**variables, "params": params}
            pred, mutated = model.apply(
                vs, batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return loss_fn(pred, batch), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_of, has_aux=True)(
            variables["params"]
        )
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return {**variables, "params": params, **mutated}, opt_state, loss

    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis))   # shard every leaf's leading axis
    jitted = jax.jit(step, in_shardings=(rep, rep, shd, rep),
                     out_shardings=(rep, rep, rep))

    def with_default_rng(variables, opt_state, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return jitted(variables, opt_state, batch, rng)

    return with_default_rng


def dp_train_step(model, tx, mesh: Mesh, loss_fn: Callable,
                  axis: str = "dp"):
    """Build a jit-compiled data-parallel train step.

    Returns step(variables, opt_state, sharded_batch, rng=None) ->
    (variables, opt_state, loss).  ``sharded_batch`` has a leading [dp] axis
    sharded over the mesh; variables/opt_state are replicated.  ``rng`` seeds
    dropout (folded with the device index so each shard draws its own mask);
    thread a fresh per-step key for models with dropout.
    """

    def per_device(variables, opt_state, batch, rng):
        # batch arrives with the leading dp axis stripped to size 1
        batch = jax.tree.map(lambda x: x[0], batch)
        rng = collectives.fold_in_axes(rng, axis)

        def loss_of(params):
            vs = {**variables, "params": params}
            pred, mutated = model.apply(
                vs, batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return loss_fn(pred, batch), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_of, has_aux=True)(
            variables["params"]
        )
        grads = collectives.all_reduce_sum(grads, axis)
        loss = collectives.all_reduce_sum(loss, axis)
        # batch statistics are averaged across shards
        mutated = collectives.all_reduce_mean(mutated, axis)
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return {**variables, "params": params, **mutated}, opt_state, loss

    rep = P()
    shd = P(axis)
    mapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, shd, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def with_default_rng(variables, opt_state, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return jitted(variables, opt_state, batch, rng)

    return with_default_rng
