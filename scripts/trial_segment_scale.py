"""Segment-reduction strategy trial at molecular-box scale (round 3).

The toy-regime verdict (one-hot MXU matmul, N <= 4096) does not transfer
to 10k-100k-node graphs; above the threshold ops/scatter.py falls back to
XLA scatter-add.  This measures, on the real chip, for E ~ 14 N and
D in {128, 1536}:

  a) scatter-add          jax.ops.segment_sum (unsorted edge order)
  b) sorted scatter-add   edges pre-sorted by receiver on host +
                          indices_are_sorted=True (XLA fast path)
  c) dense neighbor sum   host-built [N, K] neighbor-list (K = max degree,
                          padded); gather + mask + sum over K — no scatter
                          at all (the NequIP/Allegro-style TPU layout)

Each timed region is fwd + bwd (vjp) of sum(reduction), scanned ``steps``
times in one device execution, fetched per CLAUDE.md protocol.

Usage: python scripts/trial_segment_scale.py [--nodes 10000,30000]
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


def timed_scan(fn, args, steps, reps=3):
    @jax.jit
    def run(seed, *a):
        def body(c, i):
            out = fn(*a, c * 0 + i)   # perturb: defeat LICM/caching
            return c + out, None

        tot, _ = jax.lax.scan(body, seed, jnp.arange(steps, dtype=jnp.float32))
        return tot

    r = run(jnp.float32(0), *args)
    float(r)
    r = run(jnp.float32(1), *args)
    float(r)
    t0 = time.time()
    for k in range(reps):
        float(run(jnp.float32(2 + k), *args))
    return (time.time() - t0) / (steps * reps) * 1000.0  # ms per step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=str, default="10000,30000")
    ap.add_argument("--dims", type=str, default="128,1536")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from geometric_message_passing_tpu import datasets as ds

    for n_nodes in [int(x) for x in args.nodes.split(",")]:
        g = ds.create_molecular_boxes(num=1, n_nodes=n_nodes, cutoff=3.0,
                                      avg_degree=14, seed=0)[0]
        recv = g.edge_index[0].astype(np.int32)
        E = recv.shape[0]
        order = np.argsort(recv, kind="stable")
        recv_sorted = recv[order]
        # dense neighbor list [N, K]: edge ids per receiver, padded with E
        deg = np.bincount(recv, minlength=n_nodes)
        K = int(deg.max())
        nbr = np.full((n_nodes, K), E, np.int32)
        slot = np.zeros(n_nodes, np.int64)
        for e, r_ in enumerate(recv):
            nbr[r_, slot[r_]] = e
            slot[r_] += 1

        for D in [int(x) for x in args.dims.split(",")]:
            rng = np.random.default_rng(0)
            data = jnp.asarray(rng.standard_normal((E, D)), jnp.float32)
            rj = jnp.asarray(recv)
            rs = jnp.asarray(recv_sorted)
            oj = jnp.asarray(order)
            nb = jnp.asarray(nbr)

            def scatter_add(x, rj, s):
                def f(d):
                    return jnp.sum(jax.ops.segment_sum(
                        d + s, rj, num_segments=n_nodes) ** 2)
                val, grad = jax.value_and_grad(f)(x)
                return val + jnp.sum(grad[0])

            def scatter_sorted(x, rs, oj, s):
                def f(d):
                    ds_ = d[oj] + s
                    return jnp.sum(jax.ops.segment_sum(
                        ds_, rs, num_segments=n_nodes,
                        indices_are_sorted=True) ** 2)
                val, grad = jax.value_and_grad(f)(x)
                return val + jnp.sum(grad[0])

            def dense_nbr(x, nb, s):
                def f(d):
                    dpad = jnp.concatenate(
                        [d + s, jnp.zeros((1, D), d.dtype)], axis=0)
                    agg = dpad[nb].sum(axis=1)        # [N, K, D] -> [N, D]
                    return jnp.sum(agg ** 2)
                val, grad = jax.value_and_grad(f)(x)
                return val + jnp.sum(grad[0])

            row = {"nodes": n_nodes, "edges": E, "D": D, "K": K}
            row["scatter_add_ms"] = round(
                timed_scan(scatter_add, (data, rj), args.steps), 3)
            row["scatter_sorted_ms"] = round(
                timed_scan(scatter_sorted, (data, rs, oj), args.steps), 3)
            row["dense_nbr_ms"] = round(
                timed_scan(dense_nbr, (data, nb), args.steps), 3)
            row["device"] = str(jax.devices()[0])
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
