"""Box-scale roofline report (round-4 VERDICT weak-7: move the MFU story
off toy shapes): static XLA cost counters of the full train step at
molecular-box shapes, combined with the MEASURED ms/step from the round-4
scale table (RESULTS.md) into achieved-vs-roof fractions.

Counters come from a host-CPU AOT compile (HLO properties, not chip
properties) — same caveat as roofline_report.py: they upper-bound TPU HBM
traffic, so frac_of_roof > 1 means "traffic the TPU backend's fusion
avoided", not a physics violation.

Run: python scripts/roofline_scale.py [model ...]   (each model uses its
own box size, chosen to keep the host compile tractable).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import optax

# model -> (box nodes, measured ms/step on one v5e chip — RESULTS.md
# round-3/4 scale table, matching configs below)
CONFIGS = {
    "schnet": (30000, 48.6, dict(num_layers=4, hidden_channels=128,
                                 num_filters=128)),
    "egnn": (30000, 133.3, dict(num_layers=4, emb_dim=128)),
    "gvp": (10000, 134.1, dict(num_layers=4)),
    "mace_ff": (30000, 1479.3, dict(num_layers=2, emb_dim=64, max_ell=3,
                                    correlation=3, edge_chunk=8192)),
    "tfn_ff": (10000, 301.3, dict(num_layers=4, emb_dim=64, max_ell=2,
                                  edge_chunk=8192)),
    "dimenet": (10000, 350.1, dict(num_layers=4, triplet_chunk=262144)),
    "spherenet": (10000, 3086.5, dict(num_layers=4, triplet_chunk=131072,
                                      quad_chunk=1048576)),
}


def main(names):
    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.experiments.train import (
        init_variables, l1_sum_loss, seed_everything)
    from geometric_message_passing_tpu.graph import GraphLoader
    from geometric_message_passing_tpu.models import model_registry
    from geometric_message_passing_tpu.utils.roofline import roofline

    for name in names:
        n_nodes, ms, cfg = CONFIGS[name]
        graphs = ds.create_molecular_boxes(
            num=1, n_nodes=n_nodes, cutoff=3.0, avg_degree=14.0,
            n_species=8, seed=0)
        needs_tri = name in ("dimenet", "spherenet")
        loader = GraphLoader(graphs, batch_size=1, with_triplets=needs_tri,
                             with_quads=(name == "spherenet"))
        batch = next(iter(loader))
        edges = int(np.asarray(batch.edge_mask.sum()))
        if name in ("mace_ff", "tfn_ff"):
            from geometric_message_passing_tpu.models import (
                MACEForceField, TFNForceField)

            klass = MACEForceField if name == "mace_ff" else TFNForceField
            model = klass(in_dim=8, avg_num_neighbors=edges / n_nodes, **cfg)
        else:
            model = model_registry[name](out_dim=1, in_dim=8, **cfg)
        variables = init_variables(model, seed_everything(0), batch)
        tx = optax.adam(1e-4)
        opt_state = tx.init(variables["params"])

        def step(params, opt_state, batch):
            def loss_of(p):
                out, _ = model.apply(
                    {**variables, "params": p}, batch, train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)})
                return l1_sum_loss(out, batch)

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        r = roofline(step, variables["params"], opt_state, batch,
                     step_time_s=ms / 1e3)
        print(json.dumps({"model": name, "nodes": n_nodes, "edges": edges,
                          **r.row()}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(CONFIGS))
