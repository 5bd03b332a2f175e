"""Generate (and optionally execute) examples/geometric_gnn_101.ipynb — the
TPU-native re-creation of the reference's teaching notebook
(/root/reference/geometric_gnn_101.ipynb, 109 cells): transforms, the
MPNN -> CoordMPNN -> InvariantMPNN -> FinalMPNN progression, the
permutation/rotation unit tests (including CoordMPNN's DESIGNED rotation
failure), and the QM9-style training flow.

The cells import the tested package code (models/gnn101.py, transforms.py,
examples/qm9_pipeline.py) rather than redefining it, so the notebook can
never drift from the test suite.

Usage: python scripts/make_101_notebook.py [--execute]
"""

from __future__ import annotations

import argparse
import os
import sys

import nbformat as nbf

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MD = []
CODE = []


def md(s):
    return nbf.v4.new_markdown_cell(s.strip())


def code(s):
    return nbf.v4.new_code_cell(s.strip())


CELLS = [
    md("""
# Geometric GNNs 101 — TPU-native edition

A runnable re-creation of the reference teaching notebook
(`geometric_gnn_101.ipynb` in NW-JEFF/Geometric-Message-Passing) on top of
the JAX/XLA framework in this repo.  The storyline is the same:

1. **Graphs with geometry** — node features *and* 3-D coordinates.
2. **Transforms** — `CompleteGraph` + `SetTarget` (the QM9 preprocessing).
3. **A model progression** — vanilla MPNN → naive coordinate MPNN (breaks
   symmetry!) → invariant MPNN → equivariant MPNN.
4. **Unit tests** — permutation and rotation/translation checks, run live.
5. **QM9-style training** — MSE training with the `MAE x std` eval metric.

Everything imports the *tested* package code, so this notebook cannot
drift from the test suite (`tests/test_gnn101.py`).
"""),
    code("""
import os, sys
sys.path.insert(0, os.path.abspath(".."))   # run from examples/
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")   # teaching runs on CPU

import numpy as np
import jax.numpy as jnp
print("devices:", jax.devices())
"""),
    md("""
## 1. Molecules as geometric graphs

QM9 itself needs a download, so we use the synthetic surrogate from
`examples/qm9_pipeline.py` — same schema (atom types, 3-D positions, a
rotation-invariant target).  Swap in a real QM9 loader to reproduce the
reference exactly.
"""),
    code("""
from qm9_pipeline import make_molecules
from geometric_message_passing_tpu.transforms import complete_graph, set_target

raw = make_molecules(200, seed=0)
dataset = [set_target(complete_graph(g), 0) for g in raw]
g = dataset[0]
print(f"{g.num_nodes} atoms, {g.num_edges} edges (complete), target {g.y}")
"""),
    code("""
%matplotlib inline
from geometric_message_passing_tpu.utils.plot import plot_2d, plot_3d
ax = plot_3d(g, lim=2.0)
"""),
    md("""
## 2. Batching for XLA

JAX compiles programs for **static shapes**, so graphs are padded into
fixed-size buckets (`GraphBatch`): pad nodes/edges carry a mask and
contribute nothing.  This replaces PyG's dynamic block-diagonal batching.
"""),
    code("""
from geometric_message_passing_tpu.graph import GraphLoader, random_split

train_set, val_set, test_set = random_split(dataset, [0.8, 0.1, 0.1], seed=0)
loader = GraphLoader(train_set, batch_size=32, shuffle=True, seed=0)
batch = next(iter(loader))
print("padded nodes:", batch.atoms.shape, " real:", int(batch.node_mask.sum()))
print("padded edges:", batch.senders.shape, " real:", int(batch.edge_mask.sum()))
"""),
    md("""
## 3. The model progression

* **`MPNNModel`** — message passing on node features only; blind to geometry.
* **`CoordMPNNModel`** — naively concatenates raw coordinates into messages.
  More expressive, but **not** rotation-invariant: rotating a molecule
  changes its prediction (a bug disguised as a feature — we PROVE it below).
* **`InvariantMPNNModel`** — uses only pairwise distances: invariant.
* **`FinalMPNNModel`** — EGNN-style: updates coordinates equivariantly and
  reads out invariantly.
""" ),
    code("""
from geometric_message_passing_tpu.models.egnn import MPNNModel
from geometric_message_passing_tpu.models.gnn101 import (
    CoordMPNNModel, InvariantMPNNModel, FinalMPNNModel)

def n_params(model):
    v = model.init(jax.random.PRNGKey(0), batch)
    return sum(x.size for x in jax.tree.leaves(v["params"]))

MODELS = {
    "MPNN": MPNNModel(num_layers=4, emb_dim=64, in_dim=5, out_dim=1),
    "CoordMPNN": CoordMPNNModel(num_layers=4, emb_dim=64, in_dim=5, out_dim=1),
    "InvariantMPNN": InvariantMPNNModel(num_layers=4, emb_dim=64, in_dim=5, out_dim=1),
    "FinalMPNN": FinalMPNNModel(num_layers=4, emb_dim=64, in_dim=5, out_dim=1),
}
for name, m in MODELS.items():
    print(f"{name:>14}: {n_params(m):,} params")
"""),
    md("""
## 4. Unit tests: what symmetry does each model respect?

The reference's notebook-embedded tests (cells 29/56/81), promoted here to
live functions: run the model, permute the nodes / rotate+translate the
coordinates, run again, compare.
"""),
    code("""
from scipy.stats import ortho_group

def permutation_invariance(model, batch, seed=0):
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    n = batch.atoms.shape[0]
    rng = np.random.default_rng(seed)
    real = np.asarray(batch.node_mask)
    idx = np.arange(n); idx[real] = rng.permutation(idx[real])
    inv = np.empty_like(idx); inv[idx] = np.arange(n)
    pb = batch.replace(
        atoms=batch.atoms[idx], pos=batch.pos[idx],
        node_mask=batch.node_mask[idx], graph_id=batch.graph_id[idx],
        senders=jnp.asarray(inv)[batch.senders],
        receivers=jnp.asarray(inv)[batch.receivers])
    out_p = model.apply(variables, pb)
    return bool(np.allclose(out, out_p, atol=1e-4))

def rotation_invariance(model, batch, seed=0):
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    Q = ortho_group.rvs(3, random_state=seed).astype(np.float32)
    rb = batch.replace(pos=batch.pos @ Q.T + 0.5)
    out_r = model.apply(variables, rb)
    return bool(np.allclose(out, out_r, atol=1e-4))

for name, m in MODELS.items():
    print(f"{name:>14}:  permutation {'PASS' if permutation_invariance(m, batch) else 'FAIL'}"
          f"   rotation {'PASS' if rotation_invariance(m, batch) else 'FAIL'}")
"""),
    md("""
`CoordMPNN` **fails** the rotation test — by design.  That failure is what
motivates invariant (distance-based) and equivariant (EGNN-style) layers,
and it is enforced as an expected failure in `tests/test_gnn101.py`.
"""),
    md("""
## 5. QM9-style training

The reference trains with MSE on standardized targets and reports
`MAE x std` (de-normalized MAE).  Short run for the notebook; the full
pipeline lives in `examples/qm9_pipeline.py` and the production CLI in
`geometric_message_passing_tpu/experiments/cli.py`.
"""),
    code("""
import optax
from geometric_message_passing_tpu.experiments.train import (
    init_variables, seed_everything, tiny_init_batch)

ys = np.concatenate([np.atleast_1d(np.asarray(g.y, np.float32)) for g in train_set])
mean, std = float(ys.mean()), float(ys.std() + 1e-8)   # target standardization

model = MODELS["FinalMPNN"]
tr = GraphLoader(train_set, batch_size=32, shuffle=True, seed=0)
va = GraphLoader(val_set, batch_size=32)
variables = init_variables(model, seed_everything(0), tiny_init_batch(tr))
tx = optax.adam(1e-3)
opt = tx.init(variables["params"])

@jax.jit
def step(variables, opt, batch):
    def loss_fn(params):
        out = model.apply({**variables, "params": params}, batch)
        y = (batch.y - mean) / std
        err = (out - y) ** 2 * batch.graph_mask[:, None]
        return err.sum() / jnp.maximum(batch.graph_mask.sum(), 1)
    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    upd, opt = tx.update(grads, opt, variables["params"])
    return ({**variables, "params": optax.apply_updates(variables["params"], upd)},
            opt, loss)

for epoch in range(10):
    for b in tr:
        variables, opt, loss = step(variables, opt, b)
    if epoch % 3 == 0:
        maes, cnt = 0.0, 0
        for b in va:
            out = model.apply(variables, b) * std + mean
            maes += float((jnp.abs(out - b.y) * b.graph_mask[:, None]).sum())
            cnt += int(b.graph_mask.sum())
        print(f"epoch {epoch}: train MSE {float(loss):.4f}   val MAE {maes/cnt:.4f}")
"""),
    md("""
## Where to next

* **Expressivity experiments** — `examples/kchains.py`, `examples/rotsym.py`,
  `examples/incompleteness.py` (the reference's other notebooks, as scripts).
* **The full model zoo** — SchNet, DimeNet++, SphereNet, EGNN, GVP-GNN,
  TFN, MACE: `geometric_message_passing_tpu/models/`.
* **Angle-prediction CLI** — `python -m geometric_message_passing_tpu.experiments.cli ...`
* **Multi-chip** — `geometric_message_passing_tpu/parallel/` (DP, ZeRO,
  TP, PP, halo exchange) and README's multi-host section.
"""),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        ROOT, "examples", "geometric_gnn_101.ipynb"))
    args = ap.parse_args()

    nb = nbf.v4.new_notebook()
    nb.metadata.kernelspec = {
        "display_name": "Python 3", "language": "python", "name": "python3"}
    nb.cells = CELLS

    if args.execute:
        from nbclient import NotebookClient

        client = NotebookClient(
            nb, timeout=600, resources={
                "metadata": {"path": os.path.join(ROOT, "examples")}})
        client.execute()

    with open(args.out, "w") as f:
        nbf.write(nb, f)
    print("wrote", args.out, f"({len(nb.cells)} cells, "
          f"executed={args.execute})")


if __name__ == "__main__":
    main()
