"""Scaling-efficiency benchmark: edges/sec/chip for DP training at 1..N
devices (BASELINE.json north-star metric; the reference never measures
throughput — SURVEY §6).

On real multi-chip hardware this reports ICI scaling efficiency; on a single
chip (or the CPU mesh via XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu) it validates the harness and gives relative numbers.

Prints one JSON line per device count:
  {"devices": k, "edges_per_sec": ..., "edges_per_sec_per_chip": ...,
   "scaling_efficiency_vs_1": ...}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main(steps: int = 50, graphs_per_device: int = 32):
    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.experiments.train import l1_sum_loss
    from geometric_message_passing_tpu.graph import pad_sizes
    from geometric_message_passing_tpu.models import EGNNModel
    from geometric_message_passing_tpu.parallel import (
        dp_train_step, make_mesh, shard_batches)

    devices = jax.devices()
    results = []
    base = None
    for k in sorted({d for d in (1, 2, 4, 8, len(devices)) if d <= len(devices)}):
        devs = devices[:k]
        mesh = make_mesh((k,), ("dp",), devices=devs)
        graphs = ds.create_star_graphs(num=graphs_per_device * k,
                                       fold=[5, 6, 7], dim=3, seed=0)
        n_pad, e_pad, g_pad = pad_sizes(graphs, graphs_per_device)
        sharded = shard_batches(graphs, k, n_pad, e_pad, g_pad)
        edges_per_step = sum(g.num_edges for g in graphs)

        model = EGNNModel(num_layers=4, emb_dim=128, in_dim=1, out_dim=1)
        init_batch = jax.tree.map(lambda x: x[0], sharded)
        variables = model.init(jax.random.PRNGKey(0), init_batch)
        tx = optax.adam(1e-4)
        opt_state = tx.init(variables["params"])
        step = dp_train_step(model, tx, mesh, l1_sum_loss)

        variables, opt_state, loss = step(variables, opt_state, sharded)
        jax.block_until_ready(loss)          # compile warmup
        t0 = time.time()
        for _ in range(steps):
            variables, opt_state, loss = step(variables, opt_state, sharded)
        jax.block_until_ready(loss)
        dt = time.time() - t0
        eps = edges_per_step * steps / dt
        if base is None:
            base = eps
        row = {
            "devices": k,
            "edges_per_sec": round(eps, 0),
            "edges_per_sec_per_chip": round(eps / k, 0),
            "scaling_efficiency_vs_1": round(eps / (base * k), 3),
            "step_ms": round(dt / steps * 1e3, 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
