"""Attribute the DimeNet narrow-config 2x anomaly (round-5 VERDICT weak 2).

Round-4 measured 64-32 + remat at 6426 ms/step vs 3003 for 128-64 + remat
at the SAME 30k box — "half the model, double the time", deterministic.
This script times the interaction block's stages standalone for both
configs so the pathology is attributed to a stage, not guessed.

Usage: python scripts/trial_dimenet_narrow.py [n_nodes]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from profile_tfn import timed
from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.graph import GraphLoader
from geometric_message_passing_tpu.models.dimenet import (DimeNetPPModel,
                                                          InteractionPPBlock)
from geometric_message_passing_tpu.ops.dimenet_basis import (DistEmb,
                                                             sph_bessel_rbf)
from geometric_message_passing_tpu.ops.norms import safe_norm


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    graphs = ds.create_molecular_boxes(num=1, n_nodes=n, cutoff=3.0,
                                       avg_degree=14.0, n_species=8, seed=0)
    batch = next(iter(GraphLoader(graphs, batch_size=1,
                                  with_triplets=True)))
    tri = batch.triplets
    E = batch.senders.shape[0]
    T = tri.idx_kj.shape[0]
    pos = batch.pos
    dist = safe_norm(pos[batch.receivers] - pos[batch.senders], axis=-1)
    print(f"N={n} E={E} T={T}")
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)

    for hidden, int_emb in ((128, 64), (64, 32), (128, 32), (64, 64)):
        blk = InteractionPPBlock(hidden, int_emb, 8, 1, 2,
                                 triplet_chunk=262144, remat=True)
        basis_ctx = {
            "pos": pos,
            "rbf_sph": sph_bessel_rbf(dist, 7, 6, 10.0),
            "idx_i": tri.idx_i, "idx_j": tri.idx_j, "idx_k": tri.idx_k,
            "ns": 7,
        }
        x = f32(E, hidden)
        rbf = DistEmb(6, 10.0, 5).apply({}, dist) \
            if False else f32(E, 6)
        ctx_arr = {k: v for k, v in basis_ctx.items() if k != "ns"}
        vs = jax.jit(
            lambda key, x, rbf, ctx: blk.init(
                key, x, rbf, None, tri.idx_kj, tri.idx_ji, tri.t_mask,
                basis_ctx={**ctx, "ns": 7}),
        )(jax.random.PRNGKey(0), x, rbf, ctx_arr)

        tag = f"{hidden}-{int_emb}"

        def blk_fwd(x, rbf):
            return blk.apply(vs, x, rbf, None, tri.idx_kj, tri.idx_ji,
                             tri.t_mask, basis_ctx=basis_ctx)

        timed(f"interaction[{tag}] fwd", blk_fwd, x, rbf)

        def blk_bwd(x, rbf):
            return jax.grad(lambda x: jnp.sum(
                jnp.square(blk_fwd(x, rbf))))(x)

        timed(f"interaction[{tag}] fwd+bwd", blk_bwd, x, rbf)


if __name__ == "__main__":
    main()
