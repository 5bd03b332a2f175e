"""Piecewise attribution of the EGNN molecular-box step (round-4 VERDICT
item 5 groundwork): WHERE do the 650 ms/step at 100k nodes go?

Times each constituent op family at the real shapes (N=100k, E=1.35M,
D=128) in a fetched lax.scan per CLAUDE.md's micro-bench protocol (unique
scalar arg per call, sum-of-squares reduction, scan-index perturbation, two
fetched warmups, fetch per timed call).

Pieces:
  gather       h[snd] + h[rcv] + pos gathers, fwd+bwd (bwd of gather = scatter!)
  segsum       masked segment-sum [E,128]+[E,3]+[E,1] (the layer's 3), fwd+bwd
  segsum_wide  ONE [E,132] masked segment-sum, fwd+bwd (merge candidate)
  mlp          the message+pos MLP chain at [E,*], fwd+bwd (no indexing)
  layer        one full EGNNLayer, fwd+bwd
  step4        the full 4-layer train step (bench_scale's measurement)

Usage: python scripts/trial_egnn_scale_profile.py [--nodes 100000] [--steps 3]
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


def timed(fn, *args, steps=3, reps=3):
    """Median-of-reps of a scan of ``steps`` applications, fetched."""

    @jax.jit
    def run(c0, *a):
        def body(c, i):
            out = fn(c, i, *a)
            return out, None

        c, _ = jax.lax.scan(body, c0, jnp.arange(steps))
        return c

    c0 = jnp.float32(0.0)
    for _ in range(2):
        float(run(c0, *args))   # warmup incl. one-time upload
    ts = []
    for r in range(reps):
        t0 = time.time()
        float(run(c0 + r + 1, *args))   # unique scalar arg per call
        ts.append((time.time() - t0) / steps)
    return float(np.median(ts)) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=100000)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.graph import GraphLoader
    from geometric_message_passing_tpu.models.egnn import EGNNLayer
    from geometric_message_passing_tpu.ops.scatter import segment_sum

    graphs = ds.create_molecular_boxes(
        num=1, n_nodes=args.nodes, cutoff=3.0, avg_degree=14.0,
        n_species=8, seed=0)
    batch = next(iter(GraphLoader(graphs, batch_size=1)))
    n = batch.atoms.shape[0]
    e = batch.senders.shape[0]
    d = 128
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    msg = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))
    pos3 = jnp.asarray(rng.standard_normal((e, 3)).astype(np.float32))
    one = jnp.ones((e, 1), jnp.float32)
    snd, rcv, em = batch.senders, batch.receivers, batch.edge_mask
    pos = batch.pos

    rows = {}

    # ---- gather fwd+bwd -------------------------------------------------
    def gather_loss(h_, c):
        x = h_ * (1.0 + 0.0 * c)
        g = x[snd] + x[rcv]
        return jnp.sum(g * g)

    def gather_piece(c, i, h_):
        v, grad = jax.value_and_grad(gather_loss, argnums=0)(h_, c + i)
        return c + v * 1e-12 + jnp.sum(grad[0] ** 2) * 1e-12

    rows["gather_fwdbwd_ms"] = timed(gather_piece, h, steps=args.steps)

    # ---- segment sums fwd+bwd ------------------------------------------
    def seg3_loss(m_, p_, o_, c):
        a = segment_sum(m_ * (1 + 0 * c), rcv, n, mask=em)
        b = segment_sum(p_, rcv, n, mask=em)
        k = segment_sum(o_, rcv, n, mask=em)
        return jnp.sum(a * a) + jnp.sum(b * b) + jnp.sum(k * k)

    def seg3_piece(c, i, m_, p_, o_):
        v, g = jax.value_and_grad(seg3_loss)(m_, p_, o_, c + i)
        return c + v * 1e-12 + jnp.sum(g[0, 0] ** 2) * 1e-12

    rows["segsum3_fwdbwd_ms"] = timed(seg3_piece, msg, pos3, one,
                                      steps=args.steps)

    def segw_loss(m_, p_, o_, c):
        wide = jnp.concatenate([m_ * (1 + 0 * c), p_, o_], axis=-1)
        a = segment_sum(wide, rcv, n, mask=em)
        return jnp.sum(a * a)

    def segw_piece(c, i, m_, p_, o_):
        v, g = jax.value_and_grad(segw_loss)(m_, p_, o_, c + i)
        return c + v * 1e-12 + jnp.sum(g[0, 0] ** 2) * 1e-12

    rows["segsum_wide_fwdbwd_ms"] = timed(segw_piece, msg, pos3, one,
                                          steps=args.steps)

    # ---- the MLP chain at [E, *] ---------------------------------------
    layer = EGNNLayer(emb_dim=d)
    h_i = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))
    h_j = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))
    dists = jnp.asarray(rng.standard_normal((e, 1)).astype(np.float32))
    lvars = layer.init(jax.random.PRNGKey(0), h, pos, snd, rcv, em)

    def mlp_loss(hi, c):
        m, s = layer.apply(lvars, hi * (1 + 0 * c), h_j, dists,
                           method=layer.message)
        return jnp.sum(m * m) + jnp.sum(s * s)

    def mlp_piece(c, i, hi):
        v, g = jax.value_and_grad(mlp_loss)(hi, c + i)
        return c + v * 1e-12 + jnp.sum(g[0] ** 2) * 1e-12

    rows["mlp_fwdbwd_ms"] = timed(mlp_piece, h_i, steps=args.steps)

    # ---- one full layer fwd+bwd ----------------------------------------
    def layer_loss(h_, c):
        hn, pn = layer.apply(lvars, h_ * (1 + 0 * c), pos, snd, rcv, em)
        return jnp.sum(hn * hn) + jnp.sum(pn * pn)

    def layer_piece(c, i, h_):
        v, g = jax.value_and_grad(layer_loss)(h_, c + i)
        return c + v * 1e-12 + jnp.sum(g[0] ** 2) * 1e-12

    rows["layer_fwdbwd_ms"] = timed(layer_piece, h, steps=args.steps)

    out = {"nodes": n, "edges": int(np.asarray(jnp.sum(em))), "d": d,
           **{k: round(v, 2) for k, v in rows.items()},
           "device": str(jax.devices()[0])}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
