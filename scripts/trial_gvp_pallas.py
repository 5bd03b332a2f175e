"""A/B trial: fused Pallas GVPConv kernel vs the XLA twin, on the chip.

Decides GVPConv(use_pallas=...)'s default (CLAUDE.md round-2 lead): the
fused kernel runs the whole 3-GVP edge chain + masked segment mean as ONE
pallas_call per direction (ops/pallas_gvp.py); the XLA path is ~30 kernels
per layer, and at our graph sizes the hot loop is launch-bound.

Measures, for use_pallas in (False, True):
  - compile wall time of the 100-step train-step scan (Mosaic compile of
    the fwd+bwd kernels is the risk: if pathological, flip the default)
  - steady-state ms/step (bench_throughput protocol: two fetched warmups,
    fetch every timed call)

Usage: python scripts/trial_gvp_pallas.py [--layers 4] [--steps 100]
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("GMP_CPU"):  # wiring smoke-test (env JAX_PLATFORMS is
    jax.config.update("jax_platforms", "cpu")  # overridden; CLAUDE.md)

import jax.numpy as jnp
import optax


def run_variant(use_pallas: bool, num_layers: int, steps: int):
    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.experiments.train import (
        init_variables, l1_sum_loss, seed_everything, tiny_init_batch)
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes
    from geometric_message_passing_tpu.models import GVPGNNModel

    data = ds.create_star_graphs(num=100, fold=[5, 6, 7], dim=3,
                                 target="max", seed=0)
    loader = GraphLoader(data, batch_size=100, pad=pad_sizes(data, 100))
    batch = next(iter(loader))
    edges_per_batch = int(jnp.sum(batch.edge_mask))

    model = GVPGNNModel(num_layers=num_layers, out_dim=1,
                        use_pallas=use_pallas)
    variables = init_variables(model, seed_everything(0),
                               tiny_init_batch(loader))
    tx = optax.adam(5e-4)
    opt_state = tx.init(variables["params"])

    def train_step(carry, _):
        variables, opt_state = carry

        def loss_of(params):
            vs = {**variables, "params": params}
            out = model.apply(vs, batch, train=True,
                              rngs={"dropout": jax.random.PRNGKey(0)})
            return l1_sum_loss(out, batch)

        loss, grads = jax.value_and_grad(loss_of)(variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return ({**variables, "params": params}, opt_state), loss

    @jax.jit
    def run(variables, opt_state):
        (variables, opt_state), losses = jax.lax.scan(
            train_step, (variables, opt_state), None, length=steps)
        return variables, opt_state, losses[-1]

    t0 = time.time()
    v, o, l = run(variables, opt_state)   # compile + first execution
    float(l)
    compile_s = time.time() - t0
    v, o, l = run(v, o)                   # absorb one-time upload cost
    float(l)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        v, o, l = run(v, o)
        float(l)
    dt = time.time() - t0
    sps = steps * reps / dt
    print(json.dumps({
        "variant": "pallas" if use_pallas else "xla",
        "num_layers": num_layers,
        "compile_plus_first_exec_s": round(compile_s, 1),
        "ms_per_step": round(1000.0 / sps, 3),
        "steps_per_sec": round(sps, 1),
        "edges_per_sec_per_chip": round(edges_per_batch * sps, 0),
        "final_loss": round(float(l), 5),
        "device": str(jax.devices()[0]),
    }), flush=True)


if __name__ == "__main__":
    layers = 4
    steps = 100
    args = sys.argv[1:]
    if "--layers" in args:
        layers = int(args[args.index("--layers") + 1])
    if "--steps" in args:
        steps = int(args[args.index("--steps") + 1])
    variants = [False, True]
    if "--pallas-only" in args:
        variants = [True]
    if "--xla-only" in args:
        variants = [False]
    for up in variants:
        run_variant(up, layers, steps)
