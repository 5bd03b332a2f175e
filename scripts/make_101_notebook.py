"""Generate (and optionally execute) examples/geometric_gnn_101.ipynb — the
TPU-native re-creation of the reference's 109-cell teaching notebook
(/root/reference/geometric_gnn_101.ipynb): the full Part 0-5 progression —
data preparation/visualisation/batching, the MPNN formalism, the
MPNN -> CoordMPNN -> InvariantMPNN -> FinalMPNN exercise sequence (cells
25/42/62/78), all three unit-test walkthroughs (cells 29/56/81, incl.
CoordMPNN's DESIGNED rotation failure), per-model training curves, the
sample-efficiency study and the dense-vs-sparse comparison (Part 5).

The cells import the tested package code (models/gnn101.py, transforms.py,
examples/qm9_pipeline.py) and DISPLAY its source where the reference has
exercise cells, so the notebook can never drift from the test suite.

Usage: python scripts/make_101_notebook.py [--execute]
"""

from __future__ import annotations

import argparse
import os

import nbformat as nbf

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def md(s):
    return nbf.v4.new_markdown_cell(s.strip())


def code(s):
    return nbf.v4.new_code_cell(s.strip())


CELLS = [
    # ------------------------------------------------------------- title
    md("""
# A Gentle Introduction to Geometric Graph Neural Networks — TPU-native edition

A runnable re-creation of the reference teaching notebook
(`geometric_gnn_101.ipynb` in NW-JEFF/Geometric-Message-Passing) on top of
the JAX/XLA framework in this repo.  Same storyline, same exercises, same
unit tests — executed live:

* **Part 0** — molecular property prediction, geometric graphs, batching,
  and the vanilla Message Passing Neural Network.
* **Part 1** — naive use of 3-D coordinates (`CoordMPNNModel`).
* **Part 2** — what invariance to rotations/translations *means*, and a unit
  test that catches models which lack it.
* **Part 3** — invariant message passing with distances (`InvariantMPNNModel`).
* **Part 4** — equivariant message passing (`FinalMPNNModel`, EGNN-style).
* **Part 5** — wrap-up: sample efficiency and dense vs. sparse graphs.

Where the reference has "`# ============ YOUR CODE HERE`" exercise blanks,
this edition *displays the canonical solution source* from the tested
package (`geometric_message_passing_tpu/models/gnn101.py`), so the notebook
cannot drift from the test suite (`tests/test_gnn101.py`).
"""),
    # ------------------------------------------------------ Part 0: setup
    md("""
# ⚙️ Part 0: Installation and Setup

No installation needed here — `jax`, `flax`, `optax` and this package are
already available.  The reference's PyTorch Geometric / RDKit stack is
replaced by the TPU-native equivalents: `GraphBatch` (static-shape padded
batching), `transforms.complete_graph` (the `CompleteGraph` transform) and
a synthetic QM9 surrogate (`examples/qm9_pipeline.py` — swap in a real QM9
loader for the full dataset).
"""),
    code("""
import os, sys, inspect
sys.path.insert(0, os.path.abspath(".."))   # run from examples/
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")   # teaching runs on CPU

import numpy as np
import jax.numpy as jnp
import matplotlib.pyplot as plt
print("devices:", jax.devices())
"""),
    code("""
# Set random seed for deterministic results
from geometric_message_passing_tpu.experiments.train import seed_everything
rng_key = seed_everything(0)
np.random.seed(0)
"""),
    # ------------------------------------- Part 0: molecular data intro
    md("""
# 🧪 Part 0: Introduction to Molecular Property Prediction

Molecules are **geometric graphs**: atoms are nodes with categorical
features (the atom type) *and* 3-D coordinates; edges carry bond or
proximity structure.  The prediction target (e.g. dipole moment, atomization
energy in QM9) is a property of the whole molecule — a *graph-level*
regression.

## Data Preparation and Splitting
""" ),
    code("""
from qm9_pipeline import make_molecules
from geometric_message_passing_tpu.transforms import complete_graph, set_target

raw = make_molecules(400, seed=0)
# CompleteGraph: connect every atom pair (the reference's QM9 transform);
# SetTarget: select one of the target columns as g.y
dataset = [set_target(complete_graph(g), 0) for g in raw]
print(f"Total number of samples: {len(dataset)}.")
"""),
    code("""
from geometric_message_passing_tpu.graph import GraphLoader, random_split

train_set, val_set, test_set = random_split(dataset, [0.8, 0.1, 0.1], seed=0)
print(f"Created dataset splits with {len(train_set)} training, "
      f"{len(val_set)} validation, {len(test_set)} test samples.")
"""),
    md("""
## Visualising Molecular Graphs

The reference renders molecules with RDKit; here we use the package's
matplotlib helpers — node colors are atom types, edges the (complete)
connectivity.
"""),
    code("""
%matplotlib inline
from geometric_message_passing_tpu.utils.plot import plot_2d, plot_3d

fig = plt.figure(figsize=(10, 3))
for k in range(3):
    ax = fig.add_subplot(1, 3, k + 1, projection="3d")
    plot_3d(train_set[k], lim=2.5, ax=ax)
    ax.set_title(f"molecule {k}: {train_set[k].num_nodes} atoms")
plt.tight_layout()
"""),
    md("""
## Understanding the data objects

Each sample is a `Graph` — the JAX-side analog of a PyG `Data` object:
`atoms` (atom types), `edge_index` `[2, E]`, `pos` `[n, 3]`, and the
target `y`.
"""),
    code("""
data = train_set[0]     # one data sample, i.e. molecular graph
print(data)
print(f"This molecule has {data.num_nodes} atoms and {data.num_edges} "
      f"(directed, complete-graph) edges.")
print("atom types:", np.asarray(data.atoms))
print("y:", np.asarray(data.y))
"""),
    md("""
## Batching for XLA

PyG batches graphs into one big block-diagonal graph with dynamic shapes.
JAX compiles programs for **static shapes**, so graphs are instead padded
into fixed-size buckets (`GraphBatch`): pad nodes/edges carry a mask and
contribute nothing to message passing, reductions, or losses.  One compiled
program then serves every batch.
"""),
    code("""
loader = GraphLoader(train_set, batch_size=32, shuffle=True, seed=0)
batch = next(iter(loader))
print("padded nodes:", batch.atoms.shape, " real:", int(batch.node_mask.sum()))
print("padded edges:", batch.senders.shape, " real:", int(batch.edge_mask.sum()))
print("graphs:      ", batch.y.shape,     " real:", int(batch.graph_mask.sum()))
"""),
    md("""
Great!  We have prepared the dataset, visualised some samples, understood
the data objects and how they are batched for a static-shape compiler.
"""),
    # --------------------------------------- Part 0: MPNN formalism
    md("""
# 📩 Part 0: Introduction to Message Passing Neural Networks

## Formalism

One message-passing layer updates node features $h_i$ by aggregating
messages from neighbors $j \\in \\mathcal{N}(i)$:

$$ m_{ij} = \\psi\\big(h_i,\\ h_j,\\ e_{ij}\\big), \\qquad
   m_i = \\bigoplus_{j \\in \\mathcal{N}(i)} m_{ij}, \\qquad
   h_i' = \\phi\\big(h_i,\\ m_i\\big) $$

with $\\psi, \\phi$ MLPs and $\\bigoplus$ a permutation-invariant
aggregator (sum here).  A *model* stacks layers (with residuals), pools
node features into a graph embedding, and applies a linear readout.

## Coding the basic Message Passing layer

The reference's exercise cell 25 asks you to implement this with PyG's
`MessagePassing` base class.  The canonical TPU-native solution is
`MPNN101Layer`: gather → message MLP → masked segment-sum → update MLP.
"""),
    code("""
from geometric_message_passing_tpu.models.gnn101 import (
    MPNN101Layer, InvariantMPNNLayer, CoordMPNNModel, InvariantMPNNModel,
    FinalMPNNModel)
from geometric_message_passing_tpu.models.egnn import MPNNModel

print(inspect.getsource(MPNN101Layer))
"""),
    md("""
Instead of PyG's `propagate()` machinery, the layer is three array ops:
`h[senders]`/`h[receivers]` **gathers** replace message indexing, a masked
**`segment_sum`** replaces scatter-aggregation (pad edges are masked out),
and the update MLP consumes the concatenation.  XLA fuses the element-wise
chain into the matmuls.
"""),
    code("""
# The full MPNN model: embedding -> num_layers x (residual MPNN layer)
# -> global mean pool -> linear readout
model = MPNNModel(num_layers=4, emb_dim=64, in_dim=5, out_dim=1)
variables = model.init(jax.random.PRNGKey(0), batch)
n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
print(f"MPNNModel: {n_params:,} parameters")
print("output shape:", model.apply(variables, batch).shape, "(one scalar per graph)")
"""),
    # --------------------------- Part 0: permutation unit test (cell 29)
    md("""
## Unit test 1: permutation invariance and equivariance (reference cell 29)

Graph nets must not care about node *ordering*: the **model** output must be
unchanged (invariant) under a permutation of the nodes, and a **layer**'s
node features must permute along (equivariant).  `transforms.permute_graph`
applies a permutation to a graph; the test runs the model on both and
compares.
"""),
    code("""
from geometric_message_passing_tpu.transforms import permute_graph
from geometric_message_passing_tpu.graph import build_slot_data, assemble_batch

def batch_one(g):
    return next(iter(GraphLoader([g], batch_size=1)))

def permutation_invariance_unit_test(model, g, seed=0):
    variables = model.init(jax.random.PRNGKey(0), batch_one(g))
    out1 = model.apply(variables, batch_one(g))
    perm = np.random.default_rng(seed).permutation(g.num_nodes)
    out2 = model.apply(variables, batch_one(permute_graph(g, perm)))
    return bool(np.allclose(out1, out2, atol=1e-4))

g0 = train_set[0]
print("MPNNModel permutation invariant:",
      permutation_invariance_unit_test(MPNNModel(num_layers=2, emb_dim=32, in_dim=5), g0))
"""),
    # ----------------------------- Part 0: training helpers + MPNN run
    md("""
## Training and evaluating models

The reference trains with MSE on standardized targets and reports the
de-normalized MAE (`MAE × std`).  The helper below records the validation
curve per epoch so Part 5 can compare models.
"""),
    code("""
import optax

ys = np.concatenate([np.atleast_1d(np.asarray(g.y, np.float32)) for g in train_set])
MEAN, STD = float(ys.mean()), float(ys.std() + 1e-8)
RESULTS = {}          # name -> dict(val_curve=[...], test_mae=float)

def evaluate(model, variables, loader):
    tot, cnt = 0.0, 0
    for b in loader:
        out = model.apply(variables, b) * STD + MEAN
        tot += float((jnp.abs(out - b.y) * b.graph_mask[:, None]).sum())
        cnt += int(b.graph_mask.sum())
    return tot / max(cnt, 1)

def train_model(model, name, n_epochs=40, lr=5e-3, train_set=train_set,
                val_set=val_set, test_set=test_set, record=True):
    tr = GraphLoader(train_set, batch_size=32, shuffle=True, seed=0)
    va, te = GraphLoader(val_set, batch_size=32), GraphLoader(test_set, batch_size=32)
    variables = model.init(jax.random.PRNGKey(0), next(iter(tr)))
    tx = optax.adam(lr)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(variables, opt, b):
        def loss_fn(params):
            out, mut = model.apply({**variables, "params": params}, b,
                                   train=True, mutable=["batch_stats"])
            y = (b.y - MEAN) / STD
            err = (out - y) ** 2 * b.graph_mask[:, None]
            return err.sum() / jnp.maximum(b.graph_mask.sum(), 1), mut
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        upd, opt = tx.update(grads, opt, variables["params"])
        return ({**variables, "params": optax.apply_updates(variables["params"], upd),
                 **mut}, opt, loss)

    curve = []
    for epoch in range(n_epochs):
        for b in tr:
            variables, opt, loss = step(variables, opt, b)
        curve.append(evaluate(model, variables, va))
    test_mae = evaluate(model, variables, te)
    if record:
        RESULTS[name] = dict(val_curve=curve, test_mae=test_mae)
    print(f"{name:>14}: best val MAE {min(curve):.4f}   test MAE {test_mae:.4f}")
    return variables
"""),
    code("""
_ = train_model(MPNNModel(num_layers=4, emb_dim=64, in_dim=5, out_dim=1), "MPNN")
"""),
    code("""
plt.plot(RESULTS["MPNN"]["val_curve"], label="MPNN")
plt.xlabel("Epoch"); plt.ylabel("Val MAE"); plt.legend(); plt.title("Validation MAE")
plt.show()
"""),
    md("""
Super!  Everything up to this point is the standard (geometry-free) GNN
pipeline.  Now for the core question of this practical: **how should a GNN
use 3-D coordinates?**
"""),
    # ---------------------------------------------------------- Part 1
    md("""
# 🧊 Part 1: Geometric Graphs and Message Passing with 3D Coordinates

Our molecules have `pos` — each atom's 3-D coordinates.  The vanilla MPNN
ignores them entirely.

## 💻 Task 1.1: an MPNN that incorporates atom coordinates

The reference's exercise (cell 42): *concatenate the raw coordinates into
the initial node features*.  Canonical solution — `CoordMPNNModel`:
"""),
    code("""
print(inspect.getsource(CoordMPNNModel))
"""),
    md("""
## 💻 Task 1.2-1.3: which symmetry tests does `CoordMPNNModel` pass?

It must still be **permutation invariant** (coordinates permute with their
nodes).  Whether it respects *rotations* is Part 2's question…
"""),
    code("""
print("CoordMPNN permutation invariant:",
      permutation_invariance_unit_test(
          CoordMPNNModel(num_layers=2, emb_dim=32, in_dim=5), g0))
"""),
    md("""
## 💻 Task 1.4: train and evaluate `CoordMPNNModel`
"""),
    code("""
_ = train_model(CoordMPNNModel(num_layers=4, emb_dim=64, in_dim=5, out_dim=1), "CoordMPNN")
"""),
    code("""
for name in ["MPNN", "CoordMPNN"]:
    plt.plot(RESULTS[name]["val_curve"], label=name)
plt.xlabel("Epoch"); plt.ylabel("Val MAE"); plt.legend(); plt.title("Validation MAE")
plt.show()
"""),
    md("""
Hmm… if implemented correctly you may see a *curious result*: raw
coordinates can help on a fixed frame (the target here is built from
pairwise geometry), but the model has learned something that is **not a
property of the molecule** — rotate the molecule and the prediction
changes.  Let's prove that.
"""),
    # ---------------------------------------------------------- Part 2
    md("""
# 🔄 Part 2: Invariance to 3D Symmetries: Rotation and Translation

## 💻 Task 2.1-2.2: what *should* hold?

A molecular property does not depend on the arbitrary coordinate frame: for
any rotation $R$ and translation $t$,

$$ f\\big(\\{R x_i + t\\}, \\{h_i\\}\\big) = f\\big(\\{x_i\\}, \\{h_i\\}\\big)
\\quad \\text{(model: invariance)} $$

while a *layer* that outputs geometric quantities (e.g. updated positions)
should be **equivariant**: its geometric outputs must transform with the
frame, $\\mathbf{F}(R x + t) = R\\,\\mathbf{F}(x) + t$.

## 💻 Task 2.3: the rotation/translation unit test (reference cell 56)
"""),
    code("""
from geometric_message_passing_tpu.transforms import (
    rotate_graph, random_orthogonal_matrix)

def rot_trans_invariance_unit_test(model, g, seed=0):
    variables = model.init(jax.random.PRNGKey(0), batch_one(g))
    out1 = model.apply(variables, batch_one(g))
    Q = random_orthogonal_matrix(3, seed=seed)
    t = np.array([10.0, -5.0, 2.0], np.float32)
    out2 = model.apply(variables, batch_one(rotate_graph(g, Q, t)))
    return bool(np.allclose(out1, out2, atol=1e-4))

for name, m in [("MPNN", MPNNModel(num_layers=2, emb_dim=32, in_dim=5)),
                ("CoordMPNN", CoordMPNNModel(num_layers=2, emb_dim=32, in_dim=5))]:
    ok = rot_trans_invariance_unit_test(m, g0)
    print(f"{name:>14}: rotation/translation invariance "
          f"{'PASS' if ok else 'FAIL'}")
"""),
    md("""
`CoordMPNN` **fails** — by design.  That failure (enforced as an expected
failure in `tests/test_gnn101.py`) is the lesson of this practical: naive
coordinate features break the physics.  Parts 3 and 4 fix it in the two
principled ways.
"""),
    # ---------------------------------------------------------- Part 3
    md("""
# ✈️ Part 3: Message Passing with Invariance to 3D Rotations and Translations

## 💻 Task 3.1: an invariant message passing layer

Condition messages only on quantities that are *unchanged* by rotations and
translations — the simplest being the **pairwise distance**
$\\lVert x_i - x_j \\rVert$.  Canonical solution (reference cell 62) —
`InvariantMPNNLayer`:
"""),
    code("""
print(inspect.getsource(InvariantMPNNLayer))
""".replace("InvariantMPNNLayer", "InvariantMPNNLayer")),
    code("""
m = InvariantMPNNModel(num_layers=2, emb_dim=32, in_dim=5)
print("permutation invariant:      ", permutation_invariance_unit_test(m, g0))
print("rotation/translation inv.:  ", rot_trans_invariance_unit_test(m, g0))
"""),
    code("""
_ = train_model(InvariantMPNNModel(num_layers=4, emb_dim=64, in_dim=5, out_dim=1),
                "InvariantMPNN")
"""),
    code("""
for name in ["MPNN", "CoordMPNN", "InvariantMPNN"]:
    plt.plot(RESULTS[name]["val_curve"], label=name)
plt.xlabel("Epoch"); plt.ylabel("Val MAE"); plt.legend(); plt.title("Validation MAE")
plt.show()
"""),
    md("""
You have now gone from a vanilla `MPNNModel`, to a naive use of coordinates,
to a geometrically principled **invariant** model.  One step further:
keep the *directional* information without breaking symmetry.
"""),
    # ---------------------------------------------------------- Part 4
    md("""
# 🚀 Part 4: Message Passing with Equivariance to 3D Rotations and Translations

## 💻 Task 4.1-4.2: an equivariant message passing layer

Invariant models throw away directions.  An **equivariant** layer keeps a
geometric channel: it updates positions with relative-vector messages

$$ x_i' = x_i + \\frac{1}{|\\mathcal{N}(i)|} \\sum_{j}
   (x_i - x_j)\\,\\phi_x(m_{ij}) $$

so positions transform *with* the frame, while $h$ stays invariant — the
EGNN recipe.  Canonical solution (reference cell 78) —
`EquivariantMPNNLayer`:
"""),
    code("""
from geometric_message_passing_tpu.models.gnn101 import EquivariantMPNNLayer
print(inspect.getsource(EquivariantMPNNLayer))
"""),
    md("""
## Unit test 3: layer equivariance (reference cell 81)

The layer's updated positions must rotate with the input; its features must
not change.
"""),
    code("""
def rot_trans_equivariance_unit_test(seed=0):
    b = batch_one(g0)
    layer = EquivariantMPNNLayer(emb_dim=32)
    h0 = jnp.ones((b.atoms.shape[0], 32))
    ea = jnp.zeros((b.senders.shape[0], 4))
    variables = layer.init(jax.random.PRNGKey(0), h0, b.pos, b.senders,
                           b.receivers, ea, b.edge_mask)
    h1, p1 = layer.apply(variables, h0, b.pos, b.senders, b.receivers, ea,
                         b.edge_mask)
    Q = jnp.asarray(random_orthogonal_matrix(3, seed=seed)); t = 3.0
    h2, p2 = layer.apply(variables, h0, b.pos @ Q.T + t, b.senders,
                         b.receivers, ea, b.edge_mask)
    feat_inv = bool(np.allclose(h1, h2, atol=1e-4))
    pos_equi = bool(np.allclose(p1 @ Q.T + t, p2, atol=1e-4))
    return feat_inv, pos_equi

fi, pe = rot_trans_equivariance_unit_test()
print(f"EquivariantMPNNLayer: feature invariance {'PASS' if fi else 'FAIL'}, "
      f"position equivariance {'PASS' if pe else 'FAIL'}")
"""),
    code("""
_ = train_model(FinalMPNNModel(num_layers=4, emb_dim=64, in_dim=5, out_dim=1),
                "FinalMPNN")
"""),
    code("""
for name in RESULTS:
    plt.plot(RESULTS[name]["val_curve"], label=name)
plt.xlabel("Epoch"); plt.ylabel("Val MAE"); plt.legend(); plt.title("Validation MAE")
plt.show()
"""),
    md("""
Congratulations!  You have gone from a vanilla `MPNNModel` all the way to a
rotation-**equivariant** model — the design axis along which the whole
model zoo in this repo (SchNet → DimeNet → SphereNet → EGNN → GVP → TFN →
MACE) varies.
"""),
    # ---------------------------------------------------------- Part 5
    md("""
# 🌯 Part 5: Wrapping up

### Sample efficiency

## 💻 Task 5.1: study the models' validation curves

Which inductive bias buys the most per epoch?
"""),
    code("""
fig, axes = plt.subplots(1, 2, figsize=(11, 4))
for name in RESULTS:
    axes[0].plot(RESULTS[name]["val_curve"], label=name)
axes[0].set_xlabel("Epoch"); axes[0].set_ylabel("Val MAE"); axes[0].legend()
axes[0].set_title("Validation MAE per epoch")
names = list(RESULTS)
axes[1].bar(names, [RESULTS[n]["test_mae"] for n in names])
axes[1].set_ylabel("Test MAE"); axes[1].set_title("Final test MAE")
plt.setp(axes[1].get_xticklabels(), rotation=20)
plt.tight_layout(); plt.show()
"""),
    md("""
Typical outcome (matching the reference's narrative): the geometry-aware
models beat the blind MPNN; the invariant/equivariant models additionally
keep that advantage under *any* pose of the test molecules, which
`CoordMPNN` does not.

### Dense vs. Sparse Graphs

## 💻 Task 5.2: compare models on complete vs. radius-sparsified graphs

The complete-graph transform lets one layer see every atom pair (distance
information is complete) at $O(n^2)$ edges.  Real pipelines sparsify with a
radius cutoff — cheaper, but distance information beyond the cutoff must
now travel multiple hops.
"""),
    code("""
from geometric_message_passing_tpu.graph import Graph
from geometric_message_passing_tpu.ops.radius_graph import radius_graph

def radius_sparsify(g, r=1.5):
    ei = radius_graph(np.asarray(g.pos), r=r)
    return Graph(g.atoms, ei.astype(np.int32), g.pos, g.y)

sparse_dataset = [radius_sparsify(g) for g in dataset]
train_sp, val_sp, test_sp = random_split(sparse_dataset, [0.8, 0.1, 0.1], seed=0)

e_dense = np.mean([g.num_edges for g in dataset])
e_sparse = np.mean([g.num_edges for g in sparse_dataset])
print(f"mean edges per molecule: complete {e_dense:.1f} vs sparse {e_sparse:.1f}")
"""),
    code("""
sparse_results = {}
for name, mk in [("MPNN", MPNNModel), ("InvariantMPNN", InvariantMPNNModel),
                 ("FinalMPNN", FinalMPNNModel)]:
    model = mk(num_layers=4, emb_dim=64, in_dim=5, out_dim=1)
    tr = GraphLoader(train_sp, batch_size=32, shuffle=True, seed=0)
    print(f"[sparse] ", end="")
    # reuse the same helper on the sparse splits, without touching RESULTS
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        train_model(model, name, n_epochs=25, train_set=train_sp,
                    val_set=val_sp, test_set=test_sp, record=False)
    line = buf.getvalue().strip()
    print(line)
    sparse_results[name] = float(line.rsplit(" ", 1)[-1])
"""),
    code("""
print(f"{'model':>14} | {'complete (test MAE)':>20} | {'sparse (test MAE)':>18}")
print("-" * 60)
for name in sparse_results:
    dense_mae = RESULTS[name]["test_mae"]
    print(f"{name:>14} | {dense_mae:>20.4f} | {sparse_results[name]:>18.4f}")
"""),
    md("""
Observations to take away (the reference's closing discussion):

* **Distance-aware models degrade gracefully** under sparsification — the
  geometry they rely on is local, and deeper stacks recover longer-range
  structure hop by hop.
* **The blind MPNN loses its connectivity crutch**: on complete graphs the
  aggregation itself leaks the molecule's size/shape; on sparse graphs it
  has less to work with.
* At production scale, sparse radius graphs are the only option — the
  framework's molecular-box benchmarks (`scripts/bench_scale.py`) run
  100k-atom radius graphs through exactly the batching machinery used here.
"""),
    md("""
## Where to next

* **Expressivity experiments** — `examples/kchains.ipynb`,
  `examples/rotsym.ipynb`, `examples/incompleteness.ipynb`,
  `examples/star_graph_pair_angle.ipynb` (the reference's other notebooks,
  executed).
* **The full model zoo** — SchNet, DimeNet++, SphereNet, EGNN, GVP-GNN,
  TFN, MACE: `geometric_message_passing_tpu/models/`.
* **Angle-prediction CLI** —
  `python -m geometric_message_passing_tpu.experiments.cli ...`
* **Multi-chip** — `geometric_message_passing_tpu/parallel/` (DP, ZeRO, TP,
  PP, halo exchange) and README's multi-host section.
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
            nb, timeout=1800, resources={
                "metadata": {"path": os.path.join(ROOT, "examples")}})
        client.execute()

    with open(args.out, "w") as f:
        nbf.write(nb, f)
    print("wrote", args.out, f"({len(nb.cells)} cells, "
          f"executed={args.execute})")


if __name__ == "__main__":
    main()
