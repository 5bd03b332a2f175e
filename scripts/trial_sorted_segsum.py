"""On-chip trial: tiled sorted segment-sum (Pallas) vs XLA scatter-add at
molecular-box scale — fwd AND fwd+bwd (round-4 VERDICT item 5).

Protocol per CLAUDE.md: fetched results, unique scalar arg per call,
sum-of-squares reduction, two warmups, scan over steps.  All big arrays are
ARGUMENTS of the jitted runner (a closed-over device array becomes an HLO
literal and kills the remote compile helper — observed HTTP 413).

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


def timed(fn, *args, steps=5, reps=3):
    @jax.jit
    def run(c0, *a):
        def body(c, i):
            return fn(c, i, *a), None

        c, _ = jax.lax.scan(body, c0, jnp.arange(steps))
        return c

    for _ in range(2):
        float(run(jnp.float32(0.0), *args))
    ts = []
    for r in range(reps):
        t0 = time.time()
        float(run(jnp.float32(r + 1), *args))
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
        build_segment_tile_plan, plan_args, sorted_segment_sum)
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
        plan = build_segment_tile_plan(rcv, n, mask=em)
        perm, starts, local = plan_args(plan)
        rcv_j, em_j = jnp.asarray(rcv), jnp.asarray(em)
        cfg = plan.cfg

        def f_pallas(x, pm, st, lc, rv, ms):
            return sorted_segment_sum(x, pm, st, lc, rv, ms, cfg)

        # correctness on-chip first
        out_p = np.asarray(jax.jit(f_pallas)(data, perm, starts, local,
                                             rcv_j, em_j))
        out_x = np.asarray(segment_sum(data, rcv_j, n, mask=em_j))
        err = float(np.max(np.abs(out_p - out_x)))

        def xla_fwd(c, i, x, rv, ms):
            o = segment_sum(x * (1 + 0 * (c + i)), rv, n, mask=ms)
            return c + jnp.sum(o * o) * 1e-12

        def pallas_fwd(c, i, x, pm, st, lc, rv, ms):
            o = f_pallas(x * (1 + 0 * (c + i)), pm, st, lc, rv, ms)
            return c + jnp.sum(o * o) * 1e-12

        def xla_fb(c, i, x, rv, ms):
            v, g = jax.value_and_grad(
                lambda x_: jnp.sum(segment_sum(x_, rv, n, mask=ms) ** 2)
            )(x * (1 + 0 * (c + i)))
            return c + v * 1e-12 + jnp.sum(g[0] ** 2) * 1e-12

        def pallas_fb(c, i, x, pm, st, lc, rv, ms):
            v, g = jax.value_and_grad(
                lambda x_: jnp.sum(f_pallas(x_, pm, st, lc, rv, ms) ** 2)
            )(x * (1 + 0 * (c + i)))
            return c + v * 1e-12 + jnp.sum(g[0] ** 2) * 1e-12

        row = {
            "nodes": n, "edges": int(em.sum()), "d": args.d,
            "j_blocks": cfg.j_blocks, "max_abs_err": err,
            "xla_fwd_ms": round(timed(xla_fwd, data, rcv_j, em_j), 2),
            "pallas_fwd_ms": round(
                timed(pallas_fwd, data, perm, starts, local, rcv_j, em_j), 2),
            "xla_fwdbwd_ms": round(timed(xla_fb, data, rcv_j, em_j), 2),
            "pallas_fwdbwd_ms": round(
                timed(pallas_fb, data, perm, starts, local, rcv_j, em_j), 2),
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(row))


if __name__ == "__main__":
    main()
