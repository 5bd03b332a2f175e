"""A/B the round-5 box-scale candidates on-chip (mace_ff / tfn_ff):

  acc   = in-place scatter accumulator (ops.scatter.segment_sum_into)
  pair  = (l1,l2)-pair-grouped uvu einsums (vs one einsum per path)

Four configs x model @ one box size; reuses bench_scale.bench_one (full
train-step timing protocol, tunnel-safe).

Usage: python scripts/trial_box_opts.py [--size 10000] [--models mace_ff,tfn_ff]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scale import MODELS, bench_one  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10000)
    ap.add_argument("--models", type=str, default="mace_ff,tfn_ff")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--configs", type=str,
                    default="path,path+acc,pair+acc,pair")
    args = ap.parse_args()

    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.graph import GraphLoader
    from geometric_message_passing_tpu.nn.tensor_product import (
        EdgeTensorProductUVU)
    from geometric_message_passing_tpu.ops import scatter

    graphs = ds.create_molecular_boxes(
        num=1, n_nodes=args.size, cutoff=3.0, avg_degree=14.0,
        n_species=8, seed=0)
    batch = next(iter(GraphLoader(graphs, batch_size=1)))

    for name in args.models.split(","):
        for tag in args.configs.split(","):
            grouping = "pair" if "pair" in tag else "path"
            inplace = "acc" in tag
            EdgeTensorProductUVU.LARGE_GROUPING = grouping
            scatter._INPLACE_MIN_SEGMENTS = (
                scatter._ONEHOT_MAX_SEGMENTS if inplace else 1 << 60)
            row = bench_one(name, MODELS[name], batch, args.steps)
            row["trial"] = tag
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
