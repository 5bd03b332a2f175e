"""Per-model roofline report: static XLA cost counters of the full train
step (fwd+bwd+adam) at the throughput-bench shapes, combined with the
measured ms/step from RESULTS.md into achieved-vs-roof fractions.

Counters are computed by AOT-compiling on the host CPU backend (FLOP/byte
counts are properties of the HLO, not the chip); achieved rates use the TPU
v5e peaks.  Run: python scripts/roofline_report.py [model ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import optax

# measured ms/step, one TPU v5e chip (RESULTS.md throughput table)
MEASURED_MS = {
    "schnet": 0.51, "egnn": 0.81, "gvp": 1.44, "tfn": 31.3,
    "mace": 10.0, "dimenet": 1.21, "spherenet": 0.72,
}
LAYERS = {
    "schnet": dict(num_layers=4), "egnn": dict(num_layers=4),
    "gvp": dict(num_layers=4), "tfn": dict(num_layers=4, max_ell=3),
    "mace": dict(num_layers=2, max_ell=3, correlation=3),
    "dimenet": dict(num_layers=4), "spherenet": dict(num_layers=2),
}


def main(names):
    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.experiments.train import (
        init_variables, l1_sum_loss, seed_everything, tiny_init_batch)
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes
    from geometric_message_passing_tpu.models import model_registry
    from geometric_message_passing_tpu.triplets import triplet_pad_sizes
    from geometric_message_passing_tpu.utils.roofline import roofline

    data = ds.create_star_graphs(num=100, fold=[5, 6, 7], dim=3,
                                 target="max", seed=0)
    pad = pad_sizes(data, 100)
    for name in names:
        model = model_registry[name](out_dim=1, **LAYERS[name])
        needs_tri = name in ("dimenet", "spherenet")
        needs_quads = name == "spherenet"
        tri_pad = (triplet_pad_sizes(data, 100, needs_quads)
                   if needs_tri else None)
        loader = GraphLoader(data, batch_size=100, pad=pad,
                             with_triplets=needs_tri, with_quads=needs_quads,
                             triplet_pad=tri_pad)
        batch = next(iter(loader))
        variables = init_variables(model, seed_everything(0),
                                   tiny_init_batch(loader))
        tx = optax.adam(5e-4)
        opt_state = tx.init(variables["params"])

        def step(params, opt_state, batch):
            def loss_of(p):
                return l1_sum_loss(
                    model.apply({**variables, "params": p}, batch), batch)

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        r = roofline(step, variables["params"], opt_state, batch,
                     step_time_s=MEASURED_MS[name] / 1e3)
        print(json.dumps({"model": name, **r.row()}))


if __name__ == "__main__":
    main(sys.argv[1:] or list(MEASURED_MS))
