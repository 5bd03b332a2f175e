"""Incompleteness counterexamples experiment — script form of the
reference's incompleteness.ipynb (cells 3-13): Pozdnyakov et al. degenerate
environment pairs with 1-layer models.

Expected outcomes (the reference's table, enforced by
tests/test_incompleteness.py):
  * two_body:  distance-only models (SchNet) FAIL; E(3)-equivariant layers pass
  * three_body: distance+angle scalarisation fails; correlation>=3 MACE passes
  * four_body_chiral: needs both parities in the hidden irreps (the
    reference's own chiral envs are rotation-equivalent — see
    datasets.create_true_chiral_envs for a corrected pair)

Run:  python examples/incompleteness.py --env two_body --models schnet egnn
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.experiments.train import run_experiment
from geometric_message_passing_tpu.graph import GraphLoader
from geometric_message_passing_tpu.models import model_registry

ENVS = {
    "two_body": ds.create_two_body_envs,
    "three_body": ds.create_three_body_envs,
    "four_body_nonchiral": ds.create_four_body_nonchiral_envs,
    "four_body_chiral": ds.create_four_body_chiral_envs,
    "true_chiral": ds.create_true_chiral_envs,
}


def build(name: str):
    if name == "schnet":
        return model_registry[name](num_layers=1, hidden_channels=32,
                                    num_filters=32, num_gaussians=16,
                                    in_dim=1, out_dim=2)
    if name == "mace":
        return model_registry[name](num_layers=1, emb_dim=16, max_ell=2,
                                    correlation=3, mlp_dim=64, in_dim=1,
                                    out_dim=2, equivariant_pred=True,
                                    pool="sum")
    return model_registry[name](num_layers=1, emb_dim=32, in_dim=1, out_dim=2,
                                equivariant_pred=True, pool="sum")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", choices=sorted(ENVS), default="two_body")
    p.add_argument("--models", nargs="+", default=["schnet", "egnn"])
    p.add_argument("--n_epochs", type=int, default=150)
    p.add_argument("--n_times", type=int, default=3)
    args = p.parse_args(argv)

    data = ENVS[args.env]()
    loader = GraphLoader(data, batch_size=len(data), y_dtype=np.int32)
    for name in args.models:
        model = build(name)
        _, test_acc, _ = run_experiment(
            model, loader, loader, loader, n_epochs=args.n_epochs,
            n_times=args.n_times,
        )
        print(f"{args.env:20s} {name:8s}: "
              f"test {np.mean(test_acc):6.1f}% ± {np.std(test_acc):.1f}")


if __name__ == "__main__":
    main()
