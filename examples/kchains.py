"""k-chains oversquashing/depth experiment — script form of the reference's
kchains.ipynb (cells 2-4): two k-chains differing only at one end; sweep
num_layers from k/2 to k+2 and report test accuracy per model.

Run (CPU or TPU):  python examples/kchains.py --k 4 --models egnn mpnn
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--models", nargs="+",
                   default=["mpnn", "egnn"])
    p.add_argument("--n_epochs", type=int, default=100)
    p.add_argument("--n_times", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-4)
    args = p.parse_args(argv)

    data = ds.create_kchains(args.k)
    loader = GraphLoader(data, batch_size=2, y_dtype=np.int32)
    print(f"k={args.k}: layers swept {args.k // 2}..{args.k + 1}")
    for name in args.models:
        for num_layers in range(args.k // 2, args.k + 2):
            model = model_registry[name](num_layers=num_layers, emb_dim=32,
                                         in_dim=1, out_dim=2)
            best_val, test_acc, _ = run_experiment(
                model, loader, loader, loader, n_epochs=args.n_epochs,
                n_times=args.n_times, lr=args.lr,
            )
            print(f"{name:8s} layers={num_layers}: "
                  f"test {np.mean(test_acc):6.1f}% ± {np.std(test_acc):.1f}")


if __name__ == "__main__":
    main()
