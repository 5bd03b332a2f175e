"""Benchmark: EGNN angle-regression training, reference headline config.

Reference baseline (BASELINE.md): EGNN 4 layers x 200 epochs on the star
dataset, n_data=1400, batch_size=100, lr 5e-4 -> train_time ~26 s/run
(exp_history.json `train_time`; hardware unrecorded).

Here the whole 200-epoch experiment (train steps, val/test evals, best-val
rule, plateau LR schedule) is ONE jit-compiled lax.scan program on the TPU,
over a device-RESIDENT dataset (graph.SlotData): the training set is
transferred to HBM once, per-epoch shuffles are device-side permutations,
and each EGNN layer's message pass runs as one fused Pallas kernel forward
and one fused kernel backward (ops/pallas_edge.py).  Reported value =
steady-state train_time of the full run (a warmup run pays compilation; the
compiled program is also persisted to a local JAX compilation cache so
subsequent bench invocations skip compile entirely).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# persistent compile cache so repeat bench runs skip XLA compilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_TRAIN_TIME_S = 26.0  # BASELINE.md: EGNN 4L x 200ep train_time


def main():
    t_setup = time.time()
    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.experiments.train import (
        fit_regression,
        init_variables,
        seed_everything,
        tiny_init_batch,
    )
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes, random_split
    from geometric_message_passing_tpu.models.egnn_fused import EGNNFusedModel

    # GMP_BENCH_MODEL=egnn selects the plain-XLA EGNN; default is the
    # fused-Pallas variant (same numerics, different kernel strategy).
    which = os.environ.get("GMP_BENCH_MODEL", "egnn_fused")
    n_data, batch_size, n_epochs, n_layers = 1400, 100, 200, 4
    data = ds.create_star_graphs(num=n_data, fold=[5, 6, 7], dim=3,
                                 target="max", seed=0)
    tr, va, te = random_split(data, [0.5, 0.2, 0.3], seed=0)
    pad = pad_sizes(data, batch_size)
    kw = dict(batch_size=batch_size, pad=pad)
    tr_l = GraphLoader(tr, shuffle=True, seed=0, **kw)
    va_l = GraphLoader(va, **kw)
    te_l = GraphLoader(te, **kw)

    if which == "egnn":
        from geometric_message_passing_tpu.models import EGNNModel
        model = EGNNModel(num_layers=n_layers, emb_dim=128, in_dim=1,
                          out_dim=1, pool="first")
    else:
        model = EGNNFusedModel(num_layers=n_layers, emb_dim=128, in_dim=1,
                               out_dim=1, pool="first")
    variables = init_variables(model, seed_everything(0), tiny_init_batch(tr_l))
    setup_time = time.time() - t_setup

    # warmup run (includes XLA compile; persisted to cache)
    warm = fit_regression(model, variables, tr_l, va_l, te_l,
                          n_epochs=n_epochs, lr=5e-4, seed=0)
    # measured runs (steady state).  The axon tunnel adds a ±0.1-0.3 s
    # dispatch jitter per execution (measured n=6 on identical code:
    # 0.909-1.231 s, same MAE to 5 digits — RESULTS.md round-4 note); the
    # reported value is the MEDIAN of 5 runs (round-5 VERDICT ask: 3
    # samples left ~0.1 s of median spread) so the driver-tracked number
    # reflects the program, not one draw of the tunnel.
    n_samples = 5
    runs = [fit_regression(model, variables, tr_l, va_l, te_l,
                           n_epochs=n_epochs, lr=5e-4, seed=1)
            for _ in range(n_samples)]
    times = sorted(r.train_time for r in runs)
    med = times[n_samples // 2]
    res = runs[[r.train_time for r in runs].index(med)]

    edges_per_epoch = sum(g.num_edges for g in tr)
    # fwd+bwd per train step; 200 epochs
    edges_per_sec = edges_per_epoch * n_epochs / res.train_time

    result = {
        "metric": "egnn_star_train_time_4l_200ep",
        "value": round(med, 4),
        "samples_s": [round(t, 4) for t in times],
        "unit": "s",
        "vs_baseline": round(BASELINE_TRAIN_TIME_S / res.train_time, 2),
        "baseline_s": BASELINE_TRAIN_TIME_S,
        "test_mae": round(res.test, 5),
        "best_val_mae": round(res.best_val, 5),
        "warmup_incl_compile_s": round(warm.train_time, 2),
        "train_edges_per_sec": round(edges_per_sec, 0),
        "setup_s": round(setup_time, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
