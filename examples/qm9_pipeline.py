"""QM9-style property-regression pipeline — script form of the teaching
notebook's QM9 flow (geometric_gnn_101.ipynb cells 5/25/33): CompleteGraph +
SetTarget transforms, target standardisation, MSE training, and the
notebook's `MAE * std` de-normalised eval metric.

QM9 itself cannot be downloaded in this environment (no egress), so the
script generates a synthetic molecular surrogate with the same schema
(atom types 0..4, 3-D coordinates, a rotation-invariant per-graph target)
— swap ``make_molecules`` for a real QM9 loader to reproduce the notebook
exactly.

Run (CPU or TPU):  python examples/qm9_pipeline.py --model egnn
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import math
import random

import jax
import jax.numpy as jnp
import numpy as np
import optax

from geometric_message_passing_tpu.experiments.train import (
    init_variables, seed_everything, tiny_init_batch)
from geometric_message_passing_tpu.graph import Graph, GraphLoader, random_split
from geometric_message_passing_tpu.models import model_registry
from geometric_message_passing_tpu.transforms import complete_graph, set_target


def make_molecules(num: int, seed: int = 0):
    """Synthetic QM9 stand-in: 5-12 atoms of 5 types; two target columns
    (a pairwise-potential energy surrogate and a size surrogate) so that
    SetTarget has something to select, like QM9's 19 targets."""
    rnd = random.Random(seed)
    out = []
    for _ in range(num):
        n = rnd.randint(5, 12)
        atoms = np.array([rnd.randrange(5) for _ in range(n)], np.int32)
        pos = np.array(
            [[rnd.gauss(0, 1) for _ in range(3)] for _ in range(n)],
            np.float32,
        )
        d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        iu = np.triu_indices(n, 1)
        energy = float(np.sum(np.exp(-d[iu]) * (1 + 0.3 * (
            atoms[iu[0]] + atoms[iu[1]]))))
        y = np.array([energy, float(n)], np.float32)
        out.append(Graph(atoms, np.zeros((2, 0), np.int32), pos, y))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="egnn")
    p.add_argument("--target", type=int, default=0)
    p.add_argument("--n_data", type=int, default=400)
    p.add_argument("--n_epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args(argv)

    # notebook cell 5: CompleteGraph() + SetTarget() transforms
    data = [set_target(complete_graph(g), args.target)
            for g in make_molecules(args.n_data)]
    # target standardisation (notebook normalises y; eval de-normalises)
    ys = np.array([float(np.asarray(g.y)[0]) for g in data])
    mean, std = float(ys.mean()), float(ys.std() + 1e-12)
    data = [Graph(g.atoms, g.edge_index, g.pos,
                  (np.asarray(g.y) - mean) / std) for g in data]

    tr, va, te = random_split(data, [0.8, 0.1, 0.1], seed=0)
    kw = dict(batch_size=args.batch_size)
    tr_l = GraphLoader(tr, shuffle=True, seed=0, **kw)
    te_l = GraphLoader(te, **kw)

    model = model_registry[args.model](num_layers=3, emb_dim=64, in_dim=5,
                                       out_dim=1)
    variables = init_variables(model, seed_everything(0),
                               tiny_init_batch(tr_l))
    params = variables["params"]
    uv = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch):
        def loss_fn(p):
            pred = model.apply({"params": p, **uv}, batch)[:, 0]
            err = (pred - batch.y[:, 0]) ** 2 * batch.graph_mask
            return jnp.sum(err) / jnp.maximum(jnp.sum(batch.graph_mask), 1)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    @jax.jit
    def mae_sum(params, batch):
        pred = model.apply({"params": params, **uv}, batch)[:, 0]
        return jnp.sum(jnp.abs(pred - batch.y[:, 0]) * batch.graph_mask)

    for epoch in range(args.n_epochs):
        losses = []
        for batch in tr_l:
            params, opt, loss = step(params, opt, batch)
            losses.append(float(loss))
        if (epoch + 1) % 10 == 0 or epoch == 0:
            test_mae = sum(float(mae_sum(params, b)) for b in te_l) / len(te)
            # notebook cell 33: report MAE * std (de-normalised units)
            print(f"epoch {epoch + 1:3d}: train MSE {np.mean(losses):.4f} "
                  f"test MAE(denorm) {test_mae * std:.4f}")


if __name__ == "__main__":
    main()
