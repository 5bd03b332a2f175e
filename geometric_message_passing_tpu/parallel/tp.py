"""Mul-sharded tensor parallelism for MACE (SURVEY §2.5: "shard irrep channel
multiplicities of TP weights across chips").

Design (Megatron row-parallelism mapped to irrep multiplicities):

  * every feature tensor is sharded on its CHANNEL (mul) axis: shard p of k
    holds channels [p*mul/k, (p+1)*mul/k) of every irrep;
  * channel-wise ops (radial/SH edge features, SymmetricContraction,
    equivariant BatchNorm, gathers/scatters, pooling) run fully locally;
  * channel-MIXING ops (the edge tensor product's [u,w] weight contraction,
    IrrepsLinear, the invariant readout's first Dense) are row-parallel:
    local-mul input x full-mul weights -> partial full output -> one psum
    over the tp axis -> slice back to the local shard.

Communication per MACE layer: two [N, hidden.dim] psums (conv + product
linear) + one [G, emb] psum at the readout — O(N·d), independent of edge
count, riding ICI.  The numerics are EXACTLY the single-device model's
(same fan-in normalization via path_weight_scale / fan_mult); equivalence is
tested on a CPU mesh in tests/test_parallel.py.

The reference has no parallelism of any kind (no torch.distributed import
anywhere); this subsystem is designed from scratch per the BASELINE.json
north star.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..irreps import Irreps
from ..nn.tensor_product import EdgeTensorProduct
from .mesh import collectives


def tp_local_model(model, tp_size: int, axis: str = "tp"):
    """The per-shard module for a full MACEModel: local emb width, psums on
    the mixing ops."""
    assert model.emb_dim % tp_size == 0, (model.emb_dim, tp_size)
    return model.clone(emb_dim=model.emb_dim // tp_size,
                       tp_axis=axis, tp_size=tp_size)


def _fc_group_weight_cols(model, layer: int, group: int, tp_size: int,
                          shard: int) -> np.ndarray:
    """Column indices of the full edge-MLP group-``group`` head kernel that
    belong to ``shard``: for every TP path in the group, the weight block is
    [mul_in, mul_out] row-major, and a shard owns the rows of its input
    channels (row-parallel over the irrep multiplicity)."""
    sh_irreps = Irreps.spherical_harmonics(model.max_ell)
    hidden = (
        Irreps(model.hidden_irreps) if model.hidden_irreps is not None
        else (sh_irreps * model.emb_dim).sort().simplify()
    )
    in_irreps = (Irreps(f"{model.emb_dim}x0e") if layer == 0 else hidden)
    tp_full = EdgeTensorProduct(in_irreps, sh_irreps, hidden)
    start = sum(g[1] for g in tp_full._groups[:group])
    n_p = tp_full._groups[group][1]
    cols, off = [], 0
    for p in tp_full.paths[start : start + n_p]:
        u, w = p.mul_in1, p.mul_out
        u_loc = u // tp_size
        blk = np.arange(u * w).reshape(u, w)
        cols.append(off + blk[shard * u_loc : (shard + 1) * u_loc].reshape(-1))
        off += u * w
    return np.concatenate(cols)


def shard_mace_variables(variables, model, tp_size: int):
    """Split a FULL MACEModel's variables into tp_size mul-shards, stacked on
    a leading axis (ready for shard_map in_spec P('tp'))."""
    out_cols = {}
    for col, tree in variables.items():
        flat = traverse_util.flatten_dict(tree)
        shards = [dict() for _ in range(tp_size)]
        for path, x in flat.items():
            x = np.asarray(x)
            key = "/".join(path)
            if col == "u_tables":
                parts = [x] * tp_size   # channel-free CG constants: replicate
            elif key.startswith("emb_in/"):
                parts = np.split(x, tp_size, axis=-1)
            elif "/fc_out" in key:
                layer = int(path[0].split("_")[1])
                group = int(path[1][len("fc_out"):])
                parts = [
                    x[..., _fc_group_weight_cols(model, layer, group,
                                                 tp_size, p)]
                    for p in range(tp_size)
                ]
            elif "/fc/" in key:
                parts = [x] * tp_size                       # replicated
            elif "/_bn/" in key or "/SymmetricContraction" in key:
                parts = np.split(x, tp_size, axis=-1)       # per-channel
            elif "/IrrepsLinear" in key:
                parts = np.split(x, tp_size, axis=0)        # weight rows
            elif key in ("Dense_0/kernel", "pred/kernel"):
                parts = np.split(x, tp_size, axis=0)        # row-parallel in
            elif key.startswith(("Dense_", "pred/")):
                parts = [x] * tp_size                       # replicated
            else:
                raise ValueError(f"no TP sharding rule for {col}:{key}")
            for p in range(tp_size):
                shards[p][path] = parts[p]
        stacked = {
            path: jnp.stack([shards[p][path] for p in range(tp_size)])
            for path in flat
        }
        out_cols[col] = traverse_util.unflatten_dict(stacked)
    return out_cols


def tp_apply(model, sharded_variables, mesh: Mesh, axis: str = "tp"):
    """Build a jit-compiled TP forward: (sharded_variables, batch) -> out.
    ``model`` is the FULL model; the per-shard module is derived."""
    local = tp_local_model(model, mesh.shape[axis], axis)

    def per_device(variables, batch):
        variables = jax.tree.map(lambda x: x[0], variables)
        return local.apply(variables, batch, train=False)

    mapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)


def dp_tp_train_step(model, tx, mesh: Mesh, loss_fn,
                     dp_axis: str = "dp", tp_axis: str = "tp"):
    """Hybrid 2-D parallel train step over a (dp, tp) mesh: every dp row
    holds a full tp-sharded replica of the model; each dp row processes its
    own graph shard.

    Layout: ``variables``/``opt_state`` carry a leading tp-shard axis
    (``shard_mace_variables``) -> in_spec P(tp); the batch carries a leading
    dp-shard axis (``shard_batches``) -> in_spec P(dp).  Communication per
    step: the model's per-layer [N, hidden] psums ride the tp axis; ONE
    gradient psum rides the dp axis (each tp shard all-reduces only its own
    parameter slice — the dp gradient payload is 1/tp of the model).  This
    is the standard 2-D mesh recipe (scaling-book): tp inside the
    fast-ICI dimension, dp outside."""
    k = mesh.shape[tp_axis]
    local = tp_local_model(model, k, tp_axis)

    def per_device(variables, opt_state, batch, rng):
        variables = jax.tree.map(lambda x: x[0], variables)   # strip tp stack
        opt_state = jax.tree.map(lambda x: x[0], opt_state)
        batch = jax.tree.map(lambda x: x[0], batch)           # strip dp stack
        # fold ONLY the dp axis: dp replicas see different data and need
        # distinct dropout masks, but the k tp shards of one replica compute
        # the SAME activations redundantly — folding tp would desynchronize
        # their dropout masks and break the loss/k redundancy invariant below
        rng = collectives.fold_in_axes(rng, dp_axis)

        def loss_of(params):
            vs = {**variables, "params": params}
            pred, mutated = local.apply(
                vs, batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            # /k: the k tp shards compute the loss redundantly and SPMD AD
            # sums their identical cotangents through the tp psums (see
            # tp_train_step)
            return loss_fn(pred, batch) / k, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_of, has_aux=True)(
            variables["params"]
        )
        grads = jax.lax.psum(grads, axis_name=dp_axis)
        loss = jax.lax.psum(loss, axis_name=dp_axis)
        mutated = jax.tree.map(
            lambda x: jax.lax.pmean(x, axis_name=dp_axis), mutated)
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        new_vars = {**variables, "params": params, **mutated}
        stack = lambda t: jax.tree.map(lambda x: x[None], t)
        return stack(new_vars), stack(opt_state), loss * k

    mapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(tp_axis), P(tp_axis), P(dp_axis), P()),
        out_specs=(P(tp_axis), P(tp_axis), P()),
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def with_default_rng(variables, opt_state, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return jitted(variables, opt_state, batch, rng)

    return with_default_rng


def tp_train_step(model, tx, mesh: Mesh, loss_fn, axis: str = "tp"):
    """TP train step: each shard owns its parameter slice; the loss (already
    replicated after the readout psum) differentiates into exact per-shard
    gradients — no gradient collective is needed (unlike DP)."""
    k = mesh.shape[axis]
    local = tp_local_model(model, k, axis)

    def per_device(variables, opt_state, batch, rng):
        variables = jax.tree.map(lambda x: x[0], variables)
        opt_state = jax.tree.map(lambda x: x[0], opt_state)
        # NOTE: rng is NOT folded over the tp axis — every shard must draw
        # the same dropout mask for the redundant-computation invariant
        # (loss/k below) to hold; only data-parallel axes get distinct keys

        def loss_of(params):
            vs = {**variables, "params": params}
            pred, mutated = local.apply(
                vs, batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            # the loss is computed redundantly on every shard; SPMD AD sums
            # the k identical cotangents through the psums, so differentiate
            # loss/k to get exact single-device gradients
            return loss_fn(pred, batch) / k, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_of, has_aux=True)(
            variables["params"]
        )
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        new_vars = {**variables, "params": params, **mutated}
        stack = lambda t: jax.tree.map(lambda x: x[None], t)
        return stack(new_vars), stack(opt_state), loss * k

    mapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P()),
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def with_default_rng(variables, opt_state, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return jitted(variables, opt_state, batch, rng)

    return with_default_rng
