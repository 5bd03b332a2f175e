"""On-chip trial: tiled sorted segment-sum (Pallas) vs XLA scatter-add at
molecular-box scale — fwd AND fwd+bwd (round-4 VERDICT item 5).

Protocol per CLAUDE.md: fetched results, unique scalar arg per call,
sum-of-squares reduction, two warmups, scan over steps.

Usage: python scripts/trial_sorted_segsum.py [--nodes 10000,30000,100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, steps=5, reps=3):
    @jax.jit
    def run(c0):
        def body(c, i):
            return fn(c, i), None

        c, _ = jax.lax.scan(body, c0, jnp.arange(steps))
        return c

    for _ in range(2):
        float(run(jnp.float32(0.0)))
    ts = []
    for r in range(reps):
        t0 = time.time()
        float(run(jnp.float32(r + 1)))
        ts.append((time.time() - t0) / steps)
    return float(np.median(ts)) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=str, default="10000,30000,100000")
    ap.add_argument("--d", type=int, default=128)
    args = ap.parse_args()

    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.graph import GraphLoader
    from geometric_message_passing_tpu.ops.pallas_sorted_segsum import (
        build_segment_tile_plan, make_sorted_segment_sum)
    from geometric_message_passing_tpu.ops.scatter import segment_sum

    for n_nodes in [int(s) for s in args.nodes.split(",")]:
        graphs = ds.create_molecular_boxes(
            num=1, n_nodes=n_nodes, cutoff=3.0, avg_degree=14.0,
            n_species=8, seed=0)
        batch = next(iter(GraphLoader(graphs, batch_size=1)))
        n = batch.atoms.shape[0]
        rcv = np.asarray(batch.receivers)
        em = np.asarray(batch.edge_mask)
        e = rcv.shape[0]
        rng = np.random.default_rng(0)
        data = jnp.asarray(rng.standard_normal((e, args.d)).astype(np.float32))
        plan, e_pad = build_segment_tile_plan(rcv, n, mask=em)
        f_pallas = make_sorted_segment_sum(plan, rcv, e_pad, mask=em)
        rcv_j = jnp.asarray(rcv)
        em_j = jnp.asarray(em)

        # correctness on-chip first
        out_p = np.asarray(f_pallas(data))
        out_x = np.asarray(segment_sum(data, rcv_j, n, mask=em_j))
        err = float(np.max(np.abs(out_p - out_x)))

        def xla_fwd(c, i):
            o = segment_sum(data * (1 + 0 * (c + i)), rcv_j, n, mask=em_j)
            return c + jnp.sum(o * o) * 1e-12

        def pallas_fwd(c, i):
            o = f_pallas(data * (1 + 0 * (c + i)))
            return c + jnp.sum(o * o) * 1e-12

        def xla_fb(c, i):
            v, g = jax.value_and_grad(
                lambda x: jnp.sum(segment_sum(x, rcv_j, n, mask=em_j) ** 2)
            )(data * (1 + 0 * (c + i)))
            return c + v * 1e-12 + jnp.sum(g[0] ** 2) * 1e-12

        def pallas_fb(c, i):
            v, g = jax.value_and_grad(
                lambda x: jnp.sum(f_pallas(x) ** 2)
            )(data * (1 + 0 * (c + i)))
            return c + v * 1e-12 + jnp.sum(g[0] ** 2) * 1e-12

        row = {
            "nodes": n, "edges": int(em.sum()), "d": args.d,
            "j_blocks": plan.j_blocks, "max_abs_err": err,
            "xla_fwd_ms": round(timed(xla_fwd), 2),
            "pallas_fwd_ms": round(timed(pallas_fwd), 2),
            "xla_fwdbwd_ms": round(timed(xla_fb), 2),
            "pallas_fwdbwd_ms": round(timed(pallas_fb), 2),
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(row))


if __name__ == "__main__":
    main()
