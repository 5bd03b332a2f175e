"""Halo accounting for gp execution of molecular boxes (round-5 items 5+10).

For each box size and device count: Morton-partition the box, build the
packed halo plan, and report interior/boundary structure + wire bytes per
exchange (packed all_to_all vs naive all_gather) at a realistic boundary
fraction — the inputs of the multi-chip scaling model in RESULTS.md.

Pure host-side numpy (no devices needed).

Usage: python scripts/halo_box_stats.py [--sizes 10000,30000,100000] [--k 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="10000,30000,100000")
    ap.add_argument("--k", type=str, default="8")
    ap.add_argument("--payload_dim", type=int, default=64 * 16,
                    help="irrep row width (default: mace_ff hidden, "
                         "64x(0e+1o+2e+3o) = 1024 floats)")
    ap.add_argument("--cutoff", type=float, default=3.0)
    ap.add_argument("--avg_degree", type=float, default=14.0)
    args = ap.parse_args()

    import numpy as np

    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.graph import batch_graphs, pad_sizes
    from geometric_message_passing_tpu.parallel.halo import (
        build_halo_plan, halo_stats)
    from geometric_message_passing_tpu.parallel.partition import (
        morton_partition_graph, partition_stats)

    for n_nodes in [int(s) for s in args.sizes.split(",")]:
        g = ds.create_molecular_boxes(
            num=1, n_nodes=n_nodes, cutoff=args.cutoff,
            avg_degree=args.avg_degree, n_species=8, seed=0)[0]
        gm = morton_partition_graph(g)
        n_pad, e_pad, g_pad = pad_sizes([gm], 1)
        big = batch_graphs([gm], n_pad, e_pad, g_pad)
        for k in [int(s) for s in args.k.split(",")]:
            raw = partition_stats(
                g.edge_index[0], g.edge_index[1],
                (g.num_nodes + k - 1) // k * k, k)
            mor = partition_stats(
                np.asarray(big.senders), np.asarray(big.receivers),
                big.num_nodes, k, edge_mask=np.asarray(big.edge_mask))
            plan = build_halo_plan(
                np.asarray(big.senders), np.asarray(big.receivers),
                big.num_nodes, k, edge_mask=np.asarray(big.edge_mask))
            st = halo_stats(plan, payload_dim=args.payload_dim,
                            num_nodes=big.num_nodes)
            print(json.dumps({
                "nodes": n_nodes, "k": k,
                "edges": mor["edges"],
                "boundary_fraction_morton":
                    round(mor["boundary_fraction"], 4),
                "boundary_fraction_raw": round(raw["boundary_fraction"], 4),
                "unique_boundary_sources": mor["unique_boundary_sources"],
                "payload_dim": args.payload_dim,
                "wire_MB_per_exchange":
                    round(st["wire_bytes"] / 1e6, 3),
                "allgather_MB_per_exchange":
                    round(st["allgather_bytes"] / 1e6, 3),
                "packed_win":
                    round(st["allgather_bytes"] / max(st["wire_bytes"], 1),
                          2),
            }), flush=True)


if __name__ == "__main__":
    main()
