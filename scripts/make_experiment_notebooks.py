"""Generate (and execute) the four experiment notebooks matching the
reference's notebook surface (SURVEY §2.4): kchains.ipynb, rotsym.ipynb,
incompleteness.ipynb, star_graph_pair_angle.ipynb.

Each notebook drives the TESTED script form (examples/*.py, experiments
CLI) at a small demo configuration, so the notebooks cannot drift from the
test suite; the full sweeps are one flag away.  Executed outputs are
checked in.

Usage: python scripts/make_experiment_notebooks.py [--execute]
"""

from __future__ import annotations

import argparse
import os

import nbformat as nbf

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADER = """
import os, sys
sys.path.insert(0, os.path.abspath(".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")   # demo config runs on CPU
"""


def md(s):
    return nbf.v4.new_markdown_cell(s.strip())


def code(s):
    return nbf.v4.new_code_cell(s.strip())


NOTEBOOKS = {
    "kchains.ipynb": [
        md("""
# k-chains: long-range propagation and depth

Re-creation of the reference's `kchains.ipynb` (cells 2-4): two k-chain
graphs that differ only at one end; a model needs **>= floor(k/2)+1**
message-passing layers for information from the distinguishing end to
reach the readout.  We sweep depth and watch the phase transition.

Demo config below (k=4, 2 repeats); the full sweep is
`python examples/kchains.py --k 8 --models mpnn egnn --n_times 10`.
The depth threshold is enforced as a pytest behavioral test
(`tests/test_training.py::test_kchains_depth_requirement`).
"""),
        code(HEADER + """
import kchains
kchains.main(["--k", "4", "--models", "mpnn", "egnn",
              "--n_epochs", "100", "--n_times", "2"])
"""),
        md("""
Accuracy jumps from chance (50%) to 100% once `layers >= k/2 + 1` —
the reference's oversquashing/underreaching picture.
"""),
    ],
    "rotsym.ipynb": [
        md("""
# Rotationally symmetric structures

Re-creation of the reference's `rotsym.ipynb` (cells 2-4): two n-fold
rotationally symmetric star environments, 1-layer models with equivariant
prediction.  Cartesian-vector models (EGNN/GVP) are blind to the
distinction (stuck at 50%); spherical-tensor models (TFN/MACE) solve it
**iff max_ell >= fold**.

Demo: fold 3, EGNN vs TFN at max_ell in {2, 3}.  Full sweep:
`python examples/rotsym.py --fold 5 --models egnn gvp tfn mace`.
Enforced in `tests/test_training.py::test_rotsym_expressivity`.
"""),
        code(HEADER + """
import rotsym
rotsym.main(["--fold", "3", "--models", "egnn", "tfn",
             "--n_epochs", "100", "--n_times", "2"])
"""),
    ],
    "incompleteness.ipynb": [
        md("""
# Incompleteness: counterexamples to distance/angle descriptors

Re-creation of the reference's `incompleteness.ipynb` (Pozdnyakov et al.
counterexample environments): pairs of local environments that identical
distance (2-body) or distance+angle (3-body) descriptor sets cannot
distinguish.  SchNet (distances only) fails the 2-body pair; models with
angular information pass; higher-body-order equivariant models separate
the harder pairs.

Demo: the 2-body environment, SchNet vs EGNN.  Environments:
two_body / three_body / four_body_nonchiral / four_body_chiral
(`python examples/incompleteness.py --env three_body --models dimenet mace`).
Enforced in `tests/test_incompleteness.py`.
"""),
        code(HEADER + """
import incompleteness
incompleteness.main(["--env", "two_body", "--models", "schnet", "egnn",
                     "--n_epochs", "120", "--n_times", "2"])
"""),
    ],
    "star_graph_pair_angle.ipynb": [
        md("""
# Star-graph angle regression (the fork's experiment)

Re-creation of the reference's `star_graph_pair_angle.ipynb`: random star
graphs whose regression target is the (max/pairwise) angle between
labeled spokes — the task behind `experiments/graph_angle_prediction.py`
and the `exp_history.json` ledger.

Demo: a short EGNN run on `star` through the SAME experiment harness the
CLI uses (whole-experiment compiled program, best-val-checkpointed test
metric).  The production entry point with every reference flag is
`python -m geometric_message_passing_tpu.experiments.cli --model mace
--dataset paired_star ...`; accuracy-parity tables live in RESULTS.md.
"""),
        code(HEADER + """
from geometric_message_passing_tpu.experiments import cli
mean = cli.main(["--model", "egnn", "--dataset", "star", "--pool", "first",
                 "--n_layers", "2", "--n_epochs", "60", "--n_data", "300",
                 "--lr", "5e-4", "--fold", "5", "6", "7", "--cosine",
                 "--n_times", "2", "--results_file", "/tmp/nb_history.json"])
print(f"mean test MAE over repeats: {mean:.4f}")
"""),
        md("""
Each run appends a full flags+metrics record to the results ledger
(reference `exp_history.json` schema) — the comparison record used for
the accuracy-parity tables in RESULTS.md.
"""),
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true")
    args = ap.parse_args()

    for fname, cells in NOTEBOOKS.items():
        nb = nbf.v4.new_notebook()
        nb.metadata.kernelspec = {
            "display_name": "Python 3", "language": "python",
            "name": "python3"}
        nb.cells = cells
        if args.execute:
            from nbclient import NotebookClient

            NotebookClient(
                nb, timeout=1200,
                resources={"metadata": {
                    "path": os.path.join(ROOT, "examples")}},
            ).execute()
        out = os.path.join(ROOT, "examples", fname)
        with open(out, "w") as f:
            nbf.write(nb, f)
        print("wrote", out, f"executed={args.execute}")


if __name__ == "__main__":
    main()
