"""Attribute the mace_ff/tfn_ff BOX-scale step to components, on-chip.

Round-5 VERDICT item 1: the ff-stacks sit at 0.12-0.16 of the bandwidth
roof at box scale and the per-path uvu einsums were the suspect — this
script times each stage of the stack standalone (lax.scan loops, fetched
results, per CLAUDE.md micro-bench rules) so the attack targets the real
cost.

Usage: python scripts/profile_box.py [mace_ff|tfn_ff] [n_nodes]
  GMP_PROFILE_STAGES=feat,block,pb,tp,mlp,gs   (comma list; default all)
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
from geometric_message_passing_tpu.irreps import Irreps
from geometric_message_passing_tpu.nn.conv import EquivariantProductBasisBlock
from geometric_message_passing_tpu.nn.mace_blocks import (
    RealAgnosticResidualInteractionBlock)
from geometric_message_passing_tpu.ops.radial import radial_embedding
from geometric_message_passing_tpu.ops.norms import safe_norm
from geometric_message_passing_tpu.ops.spherical import spherical_harmonics


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "mace_ff"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    max_ell = 3 if which == "mace_ff" else 2
    emb = 64
    prec = "highest" if which == "mace_ff" else None
    graphs = ds.create_molecular_boxes(num=1, n_nodes=n, cutoff=3.0,
                                       avg_degree=14.0, n_species=8, seed=0)
    batch = next(iter(GraphLoader(graphs, batch_size=1)))
    E = batch.senders.shape[0]
    N = batch.atoms.shape[0]
    print(f"{which}  N={N} E={E}  max_ell={max_ell} prec={prec}")
    stages = set(os.environ.get(
        "GMP_PROFILE_STAGES", "feat,block,pb,tp,mlp,gs").split(","))

    sh_irreps = Irreps.spherical_harmonics(max_ell)
    hidden = (sh_irreps * emb).sort().simplify()
    attrs = Irreps("8x0e")
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)

    # --- featurization ---
    def featurize(pos, senders, receivers):
        vectors = pos[senders] - pos[receivers]
        lengths = safe_norm(vectors, axis=-1, keepdims=True)
        return (spherical_harmonics(vectors, max_ell),
                radial_embedding(lengths, 5.0, 8, 5))

    if "feat" in stages:
        timed("featurize (SH+bessel) fwd", featurize, batch.pos,
              batch.senders, batch.receivers)

    # --- one interaction block (chunked conv), fwd and fwd+bwd ---
    node_attrs = jax.nn.one_hot(batch.atoms, 8)
    h = f32(N, hidden.dim)
    edge_sh, edge_feats = featurize(batch.pos, batch.senders, batch.receivers)
    block = RealAgnosticResidualInteractionBlock(
        node_attrs_irreps=attrs, node_feats_irreps=hidden,
        edge_attrs_irreps=sh_irreps,
        edge_feats_irreps=Irreps("8x0e"), target_irreps=hidden,
        hidden_irreps=hidden, avg_num_neighbors=14.0,
        edge_chunk=8192, node_chunk=16384, precision=prec)
    vs = jax.jit(block.init)(jax.random.PRNGKey(0), node_attrs, h, edge_sh,
                             edge_feats, batch.senders, batch.receivers,
                             batch.edge_mask)

    def block_fwd(h, edge_sh, edge_feats):
        m, sc = block.apply(vs, node_attrs, h, edge_sh, edge_feats,
                            batch.senders, batch.receivers, batch.edge_mask)
        return (m, sc) if sc is not None else m

    if "block" in stages:
        timed("interaction fwd", block_fwd, h, edge_sh, edge_feats)

    def block_bwd(h, edge_sh, edge_feats):
        def loss(h):
            out = block_fwd(h, edge_sh, edge_feats)
            return sum(jnp.sum(jnp.square(x))
                       for x in jax.tree.leaves(out))
        return jax.grad(loss)(h)

    if "block" in stages:
        timed("interaction fwd+bwd(h)", block_bwd, h, edge_sh, edge_feats)

    if which == "mace_ff" and "pb" in stages:
        # --- product basis (symmetric contraction) ---
        pb = EquivariantProductBasisBlock(
            node_feats_irreps=hidden, target_irreps=hidden, correlation=3,
            use_sc=True, element_dependent=False, num_elements=8,
            precision=prec, node_chunk=16384)
        m = f32(N, emb, sh_irreps.dim)
        sc = f32(N, hidden.dim)
        vpb = jax.jit(pb.init)(jax.random.PRNGKey(0), m, sc, None)

        def pb_fwd(m, sc):
            return pb.apply(vpb, m, sc, None)

        timed("product basis fwd", pb_fwd, m, sc)

        def pb_bwd(m, sc):
            def loss(m):
                return jnp.sum(jnp.square(pb.apply(vpb, m, sc, None)))
            return jax.grad(loss)(m)

        timed("product basis fwd+bwd(m)", pb_bwd, m, sc)

    # --- the uvu TP alone over the chunk schedule (no MLP/scatter) ---
    from geometric_message_passing_tpu.nn.tensor_product import (
        EdgeTensorProductUVU)

    C = 8192
    n_chunks = -(-E // C)
    tp0 = EdgeTensorProductUVU(hidden, sh_irreps, hidden)
    xs = (f32(n_chunks, C, hidden.dim), f32(n_chunks, C, sh_irreps.dim),
          f32(n_chunks, C, tp0.weight_numel))

    if "tp" in stages:
        for p in (prec, None) if prec else (None,):
            tp = EdgeTensorProductUVU(hidden, sh_irreps, hidden, precision=p)
            for variant in ("per_path", "pair", "combined"):
                fn = {"per_path": tp._apply_per_path,
                      "pair": tp._apply_pair_grouped,
                      "combined": tp._apply_combined}[variant]

                def tp_all_chunks(xs, fn=fn):
                    def body(c, z):
                        x, s, w = z
                        return c + jnp.sum(jnp.square(fn(x, s, w))), None
                    tot, _ = jax.lax.scan(body, 0.0, xs)
                    return tot

                tag = f"uvu[{variant},{p or 'fast'}] x{n_chunks} chunks"
                timed(f"{tag} fwd", tp_all_chunks, xs)

                def tp_bwd(xs, fn=fn):
                    def loss(xs):
                        def body(c, z):
                            x, s, w = z
                            return c + jnp.sum(jnp.square(fn(x, s, w))), None
                        tot, _ = jax.lax.scan(body, 0.0, xs)
                        return tot
                    return jax.grad(loss)(xs)

                timed(f"{tag} fwd+bwd", tp_bwd, xs)

    # --- post-conv fold linear alone over the chunk schedule ---
    if "lin" in stages:
        from geometric_message_passing_tpu.nn.equivariant import IrrepsLinear
        import math as _math

        for p in (prec, None) if prec else (None,):
            lin = IrrepsLinear(tp0.irreps_out, hidden, precision=p)
            mj = f32(n_chunks, C, tp0.irreps_out.dim)
            vlin = jax.jit(lin.init)(jax.random.PRNGKey(0), mj[0])

            def lin_chunks(mj):
                def body(c, z):
                    return c + jnp.sum(jnp.square(lin.apply(vlin, z))), None
                tot, _ = jax.lax.scan(body, 0.0, mj)
                return tot

            timed(f"fold linear[{p or 'fast'}] x{n_chunks} fwd",
                  lin_chunks, mj)

            def lin_bwd(mj):
                return jax.grad(lambda m: lin_chunks(m))(mj)

            timed(f"fold linear[{p or 'fast'}] x{n_chunks} fwd+bwd",
                  lin_bwd, mj)

            # kron(W, I_d) block-diagonal GEMM on the natural flat layout
            ins, outs_ir = tp0.irreps_out, hidden
            in_offs = []
            ix = 0
            for mul, ir in ins:
                in_offs.append((ix, mul, ir))
                ix += mul * ir.dim
            params = vlin["params"]

            def lin_kron(mjv):
                def one(z):
                    outs = []
                    for ko, (w_mul, ir_out) in enumerate(outs_ir):
                        kis = [ki for ki, (_, _, ir) in enumerate(in_offs)
                               if ir == ir_out]
                        fan = sum(in_offs[ki][1] for ki in kis)
                        d = ir_out.dim
                        xcat = jnp.concatenate(
                            [z[..., in_offs[ki][0]:
                               in_offs[ki][0] + in_offs[ki][1] * d]
                             for ki in kis], axis=-1)
                        eye = jnp.eye(d, dtype=z.dtype)
                        Wbd = jnp.concatenate(
                            [jnp.einsum(
                                "uw,de->udwe", params[f"w{ki}_{ko}"], eye
                             ).reshape(in_offs[ki][1] * d, w_mul * d)
                             for ki in kis], axis=0)
                        y = jnp.matmul(
                            xcat, Wbd,
                            precision=("highest" if p else None))
                        outs.append(y / _math.sqrt(max(fan, 1)))
                    return jnp.concatenate(outs, axis=-1)

                def body(c, z):
                    return c + jnp.sum(jnp.square(one(z))), None
                tot, _ = jax.lax.scan(body, 0.0, mjv)
                return tot

            timed(f"fold linear kron[{p or 'fast'}] x{n_chunks} fwd",
                  lin_kron, mj)

            def lin_kron_bwd(mjv):
                return jax.grad(lambda m: lin_kron(m))(mjv)

            timed(f"fold linear kron[{p or 'fast'}] x{n_chunks} fwd+bwd",
                  lin_kron_bwd, mj)

    # --- weight MLP alone over the chunk schedule ---
    from geometric_message_passing_tpu.nn.mace_blocks import (
        E3FullyConnectedNet)

    net = E3FullyConnectedNet((64, 64, 64, tp0.weight_numel))
    ef = f32(n_chunks, C, 8)
    vnet = net.init(jax.random.PRNGKey(0), ef[0])

    def mlp_all_chunks(ef):
        def body(c, e):
            return c + jnp.sum(jnp.square(net.apply(vnet, e))), None
        tot, _ = jax.lax.scan(body, 0.0, ef)
        return tot

    if "mlp" in stages:
        timed(f"weight MLP x{n_chunks} chunks fwd", mlp_all_chunks, ef)

    # --- gather + scatter alone over the chunk schedule ---
    from geometric_message_passing_tpu.ops.scatter import segment_sum_into

    pad = n_chunks * C - E
    si = jnp.concatenate([batch.senders, jnp.zeros(pad, jnp.int32)]
                         ).reshape(n_chunks, C)
    ri = jnp.concatenate([batch.receivers, jnp.zeros(pad, jnp.int32)]
                         ).reshape(n_chunks, C)
    mk = jnp.concatenate([batch.edge_mask, jnp.zeros(pad, bool)]
                         ).reshape(n_chunks, C)
    tbl = f32(N, hidden.dim)

    def gather_scatter(tbl):
        def body(acc, z):
            s, r, m = z
            rows = tbl[s]
            return segment_sum_into(acc, rows, r, mask=m), None
        acc0 = jnp.zeros((N, hidden.dim), jnp.float32)
        acc, _ = jax.lax.scan(body, acc0, (si, ri, mk))
        return acc

    if "gs" in stages:
        timed(f"gather+scatter x{n_chunks} chunks fwd", gather_scatter, tbl)


if __name__ == "__main__":
    main()
