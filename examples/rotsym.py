"""Rotationally symmetric structures experiment — script form of the
reference's rotsym.ipynb (cells 2-4): n-fold symmetric star pairs with
1-layer models and equivariant prediction.  Cartesian-vector models
(EGNN/GVP) stay at 50%; spherical-tensor models (TFN/MACE) solve it iff
max_ell >= fold.

Run:  python examples/rotsym.py --fold 3 --models egnn tfn mace
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


def build(name: str, fold: int, max_ell: int):
    if name in ("egnn", "gvp"):
        return model_registry[name](num_layers=1, in_dim=1, out_dim=2,
                                    equivariant_pred=True, pool="sum")
    if name == "tfn":
        return model_registry[name](num_layers=1, emb_dim=8, max_ell=max_ell,
                                    mlp_dim=32, in_dim=1, out_dim=2,
                                    equivariant_pred=True, pool="first",
                                    gate=False)
    if name == "mace":
        return model_registry[name](num_layers=1, emb_dim=8, max_ell=max_ell,
                                    correlation=2, mlp_dim=32, in_dim=1,
                                    out_dim=2, equivariant_pred=True,
                                    pool="first")
    raise SystemExit(f"unsupported model {name}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fold", type=int, default=3)
    p.add_argument("--models", nargs="+", default=["egnn", "tfn"])
    p.add_argument("--max_ell", type=int, default=None,
                   help="default: sweep fold-1 and fold")
    p.add_argument("--n_epochs", type=int, default=150)
    p.add_argument("--n_times", type=int, default=3)
    args = p.parse_args(argv)

    data = ds.create_rotsym_envs(fold=args.fold)
    loader = GraphLoader(data, batch_size=2, y_dtype=np.int32)
    for name in args.models:
        ells = ([args.max_ell] if args.max_ell is not None
                else ([args.fold - 1, args.fold]
                      if name in ("tfn", "mace") else [0]))
        for ell in ells:
            model = build(name, args.fold, ell)
            _, test_acc, _ = run_experiment(
                model, loader, loader, loader, n_epochs=args.n_epochs,
                n_times=args.n_times,
            )
            tag = f" max_ell={ell}" if name in ("tfn", "mace") else ""
            print(f"{name:6s}{tag}: test {np.mean(test_acc):6.1f}% "
                  f"± {np.std(test_acc):.1f}")


if __name__ == "__main__":
    main()
