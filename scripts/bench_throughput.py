"""Per-model training-step throughput on one chip: edges/sec/chip.

Establishes the BASELINE.json north-star metric ("edges/sec/chip per layer
-- SchNet/EGNN/MACE"; the reference never measures throughput, SURVEY §6).
Each model's full train step (fwd + bwd + adam) runs as a lax.scan of
``steps`` steps inside ONE device execution, so tunnel launch overhead
(~50-100us/call) is amortized away and the number reflects device compute.

Usage: python scripts/bench_throughput.py [model ...]   (default: all)
Prints one JSON line per model:
  {"model", "num_layers", "edges_per_batch", "steps_per_sec",
   "edges_per_sec_per_chip", "edges_per_sec_per_chip_per_layer"}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

# reference-config layer counts (exp_history.json best rows)
MODELS = {
    "schnet": dict(num_layers=4),
    "egnn": dict(num_layers=4),
    "egnn_fused": dict(num_layers=4),
    "egnn_stack": dict(num_layers=4),
    "gvp": dict(num_layers=4),
    "tfn": dict(num_layers=4, max_ell=3),
    "mace": dict(num_layers=2, max_ell=3, correlation=3),
    "dimenet": dict(num_layers=4),
    "spherenet": dict(num_layers=2),
}


def build(name, cfg):
    from geometric_message_passing_tpu.models import model_registry
    from geometric_message_passing_tpu.models.egnn_fused import EGNNFusedModel

    if name == "egnn_fused":
        return EGNNFusedModel(out_dim=1, **cfg)
    if name == "egnn_stack":
        return EGNNFusedModel(out_dim=1, fuse_stack=True, **cfg)
    return model_registry[name](out_dim=1, **cfg)


def main(names):
    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.experiments.train import (
        init_variables, l1_sum_loss, seed_everything, tiny_init_batch)
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes
    from geometric_message_passing_tpu.triplets import triplet_pad_sizes

    steps, reps = 100, 3
    data = ds.create_star_graphs(num=100, fold=[5, 6, 7], dim=3,
                                 target="max", seed=0)
    for name in names:
        cfg = MODELS[name]
        needs_tri = name in ("dimenet", "spherenet")
        needs_quads = name == "spherenet"
        tri_pad = (triplet_pad_sizes(data, 100, needs_quads)
                   if needs_tri else None)
        loader = GraphLoader(data, batch_size=100, pad=pad_sizes(data, 100),
                             with_triplets=needs_tri, with_quads=needs_quads,
                             triplet_pad=tri_pad)
        batch = next(iter(loader))
        edges_per_batch = int(jnp.sum(batch.edge_mask))

        model = build(name, cfg)
        variables = init_variables(model, seed_everything(0),
                                   tiny_init_batch(loader))
        tx = optax.adam(5e-4)
        opt_state = tx.init(variables["params"])

        def train_step(carry, _):
            variables, opt_state = carry

            def loss_of(params):
                vs = {**variables, "params": params}
                out, mutated = model.apply(
                    vs, batch, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)})
                return l1_sum_loss(out, batch), mutated

            (loss, mutated), grads = jax.value_and_grad(
                loss_of, has_aux=True)(variables["params"])
            updates, opt_state = tx.update(grads, opt_state,
                                           variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            return ({**variables, "params": params, **mutated},
                    opt_state), loss

        @jax.jit
        def run(variables, opt_state):
            (variables, opt_state), losses = jax.lax.scan(
                train_step, (variables, opt_state), None, length=steps)
            return variables, opt_state, losses[-1]

        v, o, l = run(variables, opt_state)   # compile + warmup
        float(l)   # host fetch: block_until_ready does NOT reliably block
                   # on the axon tunnel (CLAUDE.md)
        v, o, l = run(v, o)
        float(l)   # absorb the ~20s ONE-TIME first-execution cost the
                   # tunnel charges after compile (program/constant upload)
        t0 = time.time()
        for _ in range(reps):
            v, o, l = run(v, o)
            float(l)   # fetch EVERY call: unfetched chained calls measure
                       # 3x slower through the tunnel's pipelining
        dt = time.time() - t0
        sps = steps * reps / dt
        eps = edges_per_batch * sps
        print(json.dumps({
            "model": name, "num_layers": cfg["num_layers"],
            "edges_per_batch": edges_per_batch,
            "steps_per_sec": round(sps, 1),
            "edges_per_sec_per_chip": round(eps, 0),
            "edges_per_sec_per_chip_per_layer": round(
                eps / cfg["num_layers"], 0),
            "device": str(jax.devices()[0]),
        }), flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(MODELS)
    main(names)
