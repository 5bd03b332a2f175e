"""Pipeline parallelism (GPipe schedule) over a ``pp`` mesh axis.

The reference has no parallelism of any kind (SURVEY §2.5); PP was initially
documented out of scope because the zoo's stacks are shallow (<=6 layers),
but the subsystem is cheap to provide and completes the §2.5 strategy table:
deep equivariant stacks (the k-chains oversquashing sweep trains up to k+2
layers) are exactly the shape PP serves.

Design — TPU-idiomatic, not a port of any GPU pipeline runtime:

  * the layer stack is HOMOGENEOUS (same param shapes per layer — true for
    every hidden conv in the zoo), stacked on a leading ``num_stages`` axis
    and sharded over the ``pp`` mesh axis, so each device holds only its
    stage's parameters (the memory win PP exists for);
  * activations move stage-to-stage with ``lax.ppermute`` over the ICI ring;
  * the GPipe schedule is a single ``lax.scan`` over M + S - 1 ticks: tick t
    has device d working on microbatch t - d (a bubble fraction of
    (S-1)/(M+S-1) — pick M >= 4*S to keep it under ~20%);
  * per-microbatch graph data (edge indices, masks, edge features) does NOT
    ride the ring: it is replicated as [M, ...] arrays and every device
    gathers the slice for the microbatch it is working on (index t - d) —
    indices are a few KB, far cheaper to gather than to ppermute;
  * the whole schedule is differentiable: ``jax.grad`` through the scan +
    ppermute produces the reverse-schedule backward pass automatically, and
    each device's parameter gradients come out resident on that device
    (no gradient collective needed over pp, unlike dp).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def stack_stage_params(per_stage_params: Sequence[Any]):
    """Stack per-stage parameter pytrees on a new leading axis (to be sharded
    over the pp mesh axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def pipeline_apply(stage_fn: Callable, stage_params, x_mb, aux_mb: Tuple = (),
                   *, mesh: Mesh, axis: str = "pp"):
    """Run ``x -> stage_{S-1}(... stage_0(x))`` for M microbatches GPipe-style.

    stage_fn(params_for_one_stage, x, *aux) -> y, with y the SAME pytree
    structure/shapes as x (a carry — true for hidden layer stacks).

    stage_params: pytree whose leaves have leading dim == mesh.shape[axis]
    (one slice per stage); sharded over ``axis`` by shard_map.
    x_mb: pytree of [M, ...] microbatch inputs (replicated).
    aux_mb: tuple of [M, ...] per-microbatch extras (edge indices, masks,
    edge features), replicated; stage_fn receives the slice matching the
    microbatch it is processing.
    Returns the [M, ...] outputs, replicated.

    Differentiable: use inside a loss and ``jax.grad`` — the backward pass
    runs the reverse pipeline schedule through the transposed ppermute.
    """
    S = mesh.shape[axis]
    M = jax.tree.leaves(x_mb)[0].shape[0]
    T = M + S - 1

    def local(stage_params, x_mb, *aux_mb):
        params = jax.tree.map(lambda p: p[0], stage_params)  # this device's
        d = jax.lax.axis_index(axis)
        x0 = jax.tree.map(lambda x: jnp.zeros_like(x[0]), x_mb)
        out0 = jax.tree.map(jnp.zeros_like, x_mb)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            x_cur, outs = carry
            # device d works on microbatch t - d (clamped gathers keep
            # shapes static; out-of-range ticks compute on garbage that
            # never reaches an output slot)
            mb = jnp.clip(t - d, 0, M - 1)
            # stage 0 ingests a fresh microbatch; others use the ring value
            x_t = jax.tree.map(lambda x: x[jnp.minimum(t, M - 1)], x_mb)
            x_in = jax.tree.map(
                lambda a, b: jnp.where(d == 0, a, b), x_t, x_cur)
            aux = tuple(jax.tree.map(lambda a: a[mb], a_) for a_ in aux_mb)
            y = stage_fn(params, x_in, *aux)
            # the last stage finished microbatch t-(S-1) this tick
            slot = t - (S - 1)
            take = (d == S - 1) & (slot >= 0)

            def put(buf, val):
                upd = jax.lax.dynamic_update_index_in_dim(
                    buf, val, jnp.clip(slot, 0, M - 1), 0)
                return jnp.where(take, upd, buf)

            outs = jax.tree.map(put, outs, y)
            x_next = jax.tree.map(
                lambda v: jax.lax.ppermute(v, axis, perm), y)
            return (x_next, outs), None

        (_, outs), _ = jax.lax.scan(tick, (x0, out0), jnp.arange(T))
        # outputs live on the last stage; zero elsewhere + psum replicates
        outs = jax.tree.map(
            lambda v: jnp.where(d == S - 1, v, jnp.zeros_like(v)), outs)
        return jax.tree.map(lambda v: jax.lax.psum(v, axis), outs)

    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P()) + tuple(P() for _ in aux_mb),
        out_specs=P(),
        check_vma=False,
    )
    return mapped(stage_params, x_mb, *aux_mb)


def egnn_pipeline_stage(emb_dim: int, activation: str = "relu",
                        norm: str = "layer", aggr: str = "sum"):
    """The REAL zoo EGNN hidden layer as a pipeline stage (round 3 — the
    flagship PP demo is a production layer, not a toy matmul stage).

    Returns ``(layer, stage_fn)``: ``layer`` is ``models.egnn.EGNNLayer``
    (init it per stage, stack with ``stack_stage_params``), ``stage_fn``
    carries the model-level state ``x = {"h": [N, D], "pos": [N, 3]}``
    through one layer with the EGNNModel residual-h / non-residual-pos
    update (egnn.py:71-79 of the reference), taking per-microbatch aux
    ``(senders, receivers, edge_mask)``.  Suitable for both
    ``pipeline_apply`` and ``sequential_apply``."""
    from ..models.egnn import EGNNLayer

    layer = EGNNLayer(emb_dim=emb_dim, activation=activation, norm=norm,
                      aggr=aggr)

    def stage_fn(params, x, senders, receivers, edge_mask):
        upd, pos2 = layer.apply({"params": params}, x["h"], x["pos"],
                                senders, receivers, edge_mask)
        return {"h": x["h"] + upd, "pos": pos2}

    return layer, stage_fn


def sequential_apply(stage_fn: Callable, stage_params, x_mb,
                     aux_mb: Tuple = ()):
    """Single-device reference: the same computation without the pipeline
    (each microbatch scanned through all stages) — the correctness twin."""

    def one_mb(x, aux):
        def body(x, params):
            return stage_fn(params, x, *aux), None

        y, _ = jax.lax.scan(body, x, stage_params)
        return y

    return jax.vmap(one_mb)(x_mb, aux_mb)
