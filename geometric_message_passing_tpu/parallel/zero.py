"""ZeRO-1 data parallelism: optimizer-state sharding over the dp axis.

Plain DP (``data.dp_train_step``) replicates the Adam moments — 2x the
parameter bytes — on every chip.  Here the flattened parameter/gradient
vector is partitioned over the dp mesh axis:

  1. each chip computes grads on its batch shard (as in plain DP),
  2. grads leave the chip via ONE ``psum_scatter`` (reduce-scatter — the
     first half of a ring all-reduce), so each chip receives only its
     1/N slice of the summed gradient,
  3. the optimizer (any optax transform whose update is elementwise in
     (grad, state, param), e.g. adam/adamw/sgd+momentum) runs on that
     slice only — moments live sharded, 1/N per chip,
  4. the updated parameter slices ride ONE tiled ``all_gather`` (the second
     half of the ring) back to every chip.

Total collective bytes equal plain DP's all-reduce (RS + AG = ring
all-reduce), while per-chip optimizer memory drops from 2·|params| to
2·|params|/N.  This is DeepSpeed ZeRO stage 1 re-expressed as XLA
collectives inside ``shard_map`` — no reference counterpart exists
(SURVEY §2.5: the reference has no distributed training at all).

Numerics are EXACTLY plain DP's: slicing commutes with any elementwise
optimizer update, and the reduce-scatter computes the same sums the
all-reduce would.  Verified by ``tests/test_parallel.py::
test_zero_dp_matches_single_device``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import collectives


def _flat_meta(params, n_shards: int):
    dtypes = {leaf.dtype for leaf in jax.tree.leaves(params)}
    if len(dtypes) > 1:
        raise TypeError(
            "ZeRO-1 requires a uniform parameter dtype: ravel_pytree would "
            "silently promote a mixed tree and the optimizer would run in "
            f"the promoted dtype; got {sorted(str(d) for d in dtypes)}"
        )
    flat, unravel = ravel_pytree(params)
    size = flat.shape[0]
    chunk = -(-size // n_shards)           # ceil
    padded = chunk * n_shards
    return unravel, size, chunk, padded, flat.dtype


def zero_init(tx, params, n_shards: int, mesh: Mesh | None = None,
              axis: str = "dp"):
    """Build the stacked sharded optimizer state: leading [dp] axis, each
    row the optax state over one 1/N slice of the flat parameter vector.

    With ``mesh``, every leaf is created directly under a
    ``NamedSharding(mesh, P(axis))`` — born sharded, so the full 2·|params|
    state is never resident on any single device (the point of ZeRO-1).
    Without it, the state is a plain stacked array (fine for tests)."""
    _, _, chunk, _, dtype = _flat_meta(params, n_shards)
    one = tx.init(jnp.zeros((chunk,), dtype))
    if mesh is None:
        return jax.tree.map(lambda x: jnp.stack([x] * n_shards), one)
    sharding = NamedSharding(mesh, P(axis))

    def born_sharded(x):
        host = np.asarray(x)
        full = np.broadcast_to(host[None], (n_shards,) + host.shape)  # a view
        return jax.make_array_from_callback(
            full.shape, sharding, lambda idx: np.ascontiguousarray(full[idx]))

    return jax.tree.map(born_sharded, one)


def zero_dp_train_step(model, tx, mesh: Mesh, loss_fn: Callable, params,
                       axis: str = "dp"):
    """Build a jit-compiled ZeRO-1 data-parallel train step.

    Returns ``step(variables, opt_state, sharded_batch, rng=None) ->
    (variables, opt_state, loss)``.  ``opt_state`` must come from
    ``zero_init`` (leading [dp] axis, sharded over the mesh);
    ``sharded_batch`` as for ``dp_train_step``; variables replicated.
    ``params`` is a template used only for the flat layout (shapes/dtypes).
    ``rng`` seeds dropout (folded with the device index); thread a fresh
    per-step key for models with dropout.
    """
    n_shards = mesh.shape[axis]
    unravel, size, chunk, padded, _ = _flat_meta(params, n_shards)

    def per_device(variables, opt_state, batch, rng):
        batch = jax.tree.map(lambda x: x[0], batch)
        opt_state = jax.tree.map(lambda x: x[0], opt_state)
        rng = collectives.fold_in_axes(rng, axis)

        def loss_of(p):
            vs = {**variables, "params": p}
            pred, mutated = model.apply(
                vs, batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return loss_fn(pred, batch), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_of, has_aux=True)(
            variables["params"]
        )

        gflat = ravel_pytree(grads)[0]
        gflat = jnp.pad(gflat, (0, padded - size))
        # reduce-scatter: each chip keeps only its slice of the summed grad
        gslice = jax.lax.psum_scatter(gflat, axis, scatter_dimension=0,
                                      tiled=True)

        pflat = jnp.pad(ravel_pytree(variables["params"])[0],
                        (0, padded - size))
        idx = jax.lax.axis_index(axis)
        pslice = jax.lax.dynamic_slice(pflat, (idx * chunk,), (chunk,))

        updates, opt_state = tx.update(gslice, opt_state, pslice)
        pslice = optax.apply_updates(pslice, updates)

        # all-gather the updated slices back into the full flat vector
        pfull = jax.lax.all_gather(pslice, axis, tiled=True)[:size]
        new_params = unravel(pfull)

        loss = collectives.all_reduce_sum(loss, axis)
        mutated = collectives.all_reduce_mean(mutated, axis)
        opt_state = jax.tree.map(lambda x: x[None], opt_state)
        return ({**variables, "params": new_params, **mutated},
                opt_state, loss)

    mapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P(axis), P()),
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def with_default_rng(variables, opt_state, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return jitted(variables, opt_state, batch, rng)

    return with_default_rng
