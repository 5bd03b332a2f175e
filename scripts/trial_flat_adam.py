"""Trial: does flattening the Adam update (optax.flatten) cut per-step time?

The optimizer update compiles to per-parameter elementwise kernels; on the
axon tunnel each kernel costs ~50-100us dispatch, and models have O(100)
parameter tensors.  optax.flatten concatenates all leaves into one vector so
the whole update is a handful of kernels.  Math is identical (adam is
elementwise).

Usage: python scripts/trial_flat_adam.py [model ...]
Prints ms/step for plain vs flat adam per model.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

MODELS = {
    "egnn": dict(num_layers=4),
    "tfn": dict(num_layers=4, max_ell=3),
    "mace": dict(num_layers=2, max_ell=3, correlation=3),
    "dimenet": dict(num_layers=4),
}


def main(names):
    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.experiments.train import (
        init_variables, l1_sum_loss, seed_everything, tiny_init_batch)
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes
    from geometric_message_passing_tpu.models import model_registry
    from geometric_message_passing_tpu.triplets import triplet_pad_sizes

    steps, reps = 100, 3
    data = ds.create_star_graphs(num=100, fold=[5, 6, 7], dim=3,
                                 target="max", seed=0)
    for name in names:
        cfg = MODELS[name]
        needs_tri = name in ("dimenet", "spherenet")
        tri_pad = (triplet_pad_sizes(data, 100, False) if needs_tri else None)
        loader = GraphLoader(data, batch_size=100, pad=pad_sizes(data, 100),
                             with_triplets=needs_tri, triplet_pad=tri_pad)
        batch = next(iter(loader))
        model = model_registry[name](out_dim=1, **cfg)
        variables = init_variables(model, seed_everything(0),
                                   tiny_init_batch(loader))
        n_leaves = len(jax.tree.leaves(variables["params"]))

        for label, tx in (("plain", optax.adam(5e-4)),
                          ("flat ", optax.flatten(optax.adam(5e-4)))):
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

            v, o, l = run(variables, opt_state)
            float(l)
            v, o, l = run(v, o)
            float(l)
            t0 = time.time()
            for _ in range(reps):
                v, o, l = run(v, o)
                float(l)
            dt = time.time() - t0
            print(f"{name:8s} {label} adam ({n_leaves} param leaves): "
                  f"{dt / (steps * reps) * 1000:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(MODELS))
