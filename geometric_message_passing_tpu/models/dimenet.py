"""DimeNet++ (Klicpera et al., directional message passing) — TPU-native
redesign of /root/reference/models/dimenet.py:9-105, which wraps PyG
``DimeNetPlusPlus`` internals.  Here embedding/interaction/output blocks are
first-class flax modules; triplets come precomputed (static shapes) on the
batch; the triplet gather->basis-multiply->scatter core is a masked segment
reduction fused by XLA.

NOTE the fork computes triplet angles at node i between (j-i) and (k-i)
(dimenet.py:86-90) rather than at j like stock DimeNet — replicated exactly.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..graph import GraphBatch
# torch_linear_*: torch.nn.Linear default inits — where the reference
# leaves layers on torch defaults (SphereNet init.lin_rbf_0/init.lin,
# spherenet_layer.py:84-88; update_v.lin_up bias, :202,210)
from ..nn.basic import torch_linear_bias_init, torch_linear_kernel_init
from ..ops.dimenet_basis import AngleEmb, DistEmb
from ..ops.scatter import segment_sum, segment_sum_into
from .pooling import POOL
from ..ops.norms import safe_arctan2, safe_norm


def glorot_orthogonal(scale: float = 2.0):
    def init(key, shape, dtype=jnp.float32):
        W = nn.initializers.orthogonal()(key, shape, dtype)
        fan_in, fan_out = shape[0], shape[1]
        W = W * jnp.sqrt(scale / ((fan_in + fan_out) * jnp.var(W)))
        return W

    return init


def swish(x):
    return x * nn.sigmoid(x)



class ResidualLayer(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        h = swish(nn.Dense(self.hidden, kernel_init=glorot_orthogonal())(x))
        h = swish(nn.Dense(self.hidden, kernel_init=glorot_orthogonal())(h))
        return x + h


class EmbeddingBlock(nn.Module):
    """x_e = act(W [emb(z_i), emb(z_j), act(W_rbf rbf)]) (PyG EmbeddingBlock)."""

    hidden: int

    @nn.compact
    def __call__(self, atoms, rbf, senders, receivers):
        emb = nn.Embed(
            95, self.hidden,
            embedding_init=nn.initializers.uniform(scale=2 * math.sqrt(3)),
            name="emb",
        )
        # torch init uniform(-sqrt3, sqrt3); flax uniform is [0, scale) — shift
        x = emb(atoms) - math.sqrt(3)
        # PyG EmbeddingBlock.reset_parameters leaves lin_rbf and lin on
        # torch.nn.Linear defaults (only the embedding is re-initialized)
        rbf0 = swish(nn.Dense(
            self.hidden, kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(rbf.shape[-1]))(rbf))
        cat = jnp.concatenate([x[receivers], x[senders], rbf0], axis=-1)
        return swish(nn.Dense(
            self.hidden, kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(3 * self.hidden))(cat))


class InteractionPPBlock(nn.Module):
    """Triplet-level directional interaction with down/up projection
    (PyG InteractionPPBlock numerics)."""

    hidden: int
    int_emb_size: int
    basis_emb_size: int
    num_before_skip: int
    num_after_skip: int
    # Process triplets in blocks of this size (round 3, molecular-box
    # scale): the [T, int_emb] gather-multiply intermediates are GBs at
    # 5M+ triplets (30k-node boxes fail compile at 128 channels).  Blocks
    # run sbf-projection -> gather -> multiply -> masked segment-sum per
    # chunk in an nn.scan with a rematerialized body; x_kj is a closed-over
    # invariant (NOT carry — scan vjp saves the carry per iteration).
    # None = single pass (identical numerics up to sum reassociation).
    triplet_chunk: Optional[int] = None

    def _triplet_pass(self, x_kj, sbf, idx_kj, idx_ji, t_mask, num_edges,
                      basis_ctx=None):
        """sbf-project + gather(idx_kj) + multiply + segment(idx_ji) —
        optionally triplet-chunked.  The two sbf Dense layers carry FIXED
        names so both modes build identical parameter trees.

        ``basis_ctx`` (round 4, the 100k-box regime): when given, the
        [T, ns*nr] spherical basis is never materialized — the per-edge
        radial half (``rbf_sph`` [E, ns*nr]) comes precomputed and the
        per-triplet half (angle from pos gathers + Legendre cbf + product)
        is evaluated INSIDE the chunk body, bounding every per-triplet
        tensor to the chunk size.  Keys: pos [N,3], rbf_sph, idx_i/j/k [T],
        ns.  Elementwise over T, so chunked == unchunked bitwise."""
        go = glorot_orthogonal

        def proj(mdl, sb):
            sb = nn.Dense(mdl.basis_emb_size, use_bias=False,
                          kernel_init=go(), name="lin_sbf1")(sb)
            return nn.Dense(mdl.int_emb_size, use_bias=False,
                            kernel_init=go(), name="lin_sbf2")(sb)

        def sbf_of(ctx, kj, ii, jj, kk):
            from ..ops.dimenet_basis import angle_cbf

            pos = ctx["pos"]
            pos_i = pos[ii]
            pos_ji = pos[jj] - pos_i
            pos_ki = pos[kk] - pos_i
            a = jnp.sum(pos_ji * pos_ki, axis=-1)
            b = safe_norm(jnp.cross(pos_ji, pos_ki), axis=-1)
            angle = safe_arctan2(b, a)
            cbf = angle_cbf(angle, ctx["ns"])              # [c, ns]
            rs = ctx["rbf_sph"][kj]                        # [c, ns*nr]
            ns = ctx["ns"]
            out = rs.reshape(rs.shape[0], ns, -1) * cbf[:, :, None]
            return out.reshape(rs.shape[0], -1)

        T = idx_kj.shape[0]
        C = self.triplet_chunk
        if C is None or T <= C:
            if sbf is None:
                sbf = sbf_of(basis_ctx, idx_kj, basis_ctx["idx_i"],
                             basis_ctx["idx_j"], basis_ctx["idx_k"])
            y = x_kj[idx_kj] * proj(self, sbf)
            return segment_sum(y, idx_ji, num_edges, mask=t_mask)
        n_chunks = -(-T // C)
        pad = n_chunks * C - T

        def pad_to(v, fill):
            if not pad:
                return v
            tail = jnp.full((pad,) + v.shape[1:], fill, v.dtype)
            return jnp.concatenate([v, tail], axis=0)

        def chunked(v, fill=0):
            return pad_to(v, fill).reshape((n_chunks, C) + v.shape[1:])

        in_chunk_basis = sbf is None
        xs = [
            chunked(idx_kj),
            chunked(idx_ji),
            chunked(t_mask, False),
        ]
        if in_chunk_basis:
            xs += [chunked(basis_ctx["idx_i"]), chunked(basis_ctx["idx_j"]),
                   chunked(basis_ctx["idx_k"])]
        else:
            xs.append(chunked(sbf))

        def body(mdl, acc, z):
            if in_chunk_basis:
                kj, ji, m, ii, jj, kk = z
                sb = sbf_of(basis_ctx, kj, ii, jj, kk)
            else:
                kj, ji, m, sb = z
            y = x_kj[kj] * proj(mdl, sb)
            return segment_sum_into(acc, y, ji, mask=m), ()

        body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False})
        acc0 = jnp.zeros((num_edges, self.int_emb_size), x_kj.dtype)
        acc, _ = scan(self, acc0, tuple(xs))
        return acc

    # Rematerialize the per-edge MLP stages around the triplet pass in the
    # backward pass (round 4, 100k-box regime): the interaction blocks'
    # residual chains are most of the ~150 live [E, hidden] activations
    # that blow past HBM at 1.35M edges (XLA memory_analysis: 108 GB).
    # Method-level remat (same pattern as the triplet-scan body) keeps the
    # parameter tree identical to the plain path.  Numerics identical.
    remat: bool = False

    @nn.compact
    def __call__(self, x, rbf, sbf, idx_kj, idx_ji, t_mask, basis_ctx=None):
        go = glorot_orthogonal
        num_edges = x.shape[0]

        def pre(mdl, x, rbf):
            x_ji = swish(nn.Dense(mdl.hidden, kernel_init=go())(x))
            x_kj = swish(nn.Dense(mdl.hidden, kernel_init=go())(x))
            rbf_p = nn.Dense(mdl.basis_emb_size, use_bias=False,
                             kernel_init=go())(rbf)
            rbf_p = nn.Dense(mdl.hidden, use_bias=False,
                             kernel_init=go())(rbf_p)
            x_kj = x_kj * rbf_p
            x_kj = swish(nn.Dense(mdl.int_emb_size, use_bias=False,
                                  kernel_init=go())(x_kj))
            return x_ji, x_kj

        def post(mdl, x_ji, x_kj, x):
            x_kj = swish(nn.Dense(mdl.hidden, use_bias=False,
                                  kernel_init=go())(x_kj))
            h = x_ji + x_kj
            for _ in range(mdl.num_before_skip):
                h = ResidualLayer(mdl.hidden)(h)
            h = swish(nn.Dense(mdl.hidden, kernel_init=go())(h)) + x
            for _ in range(mdl.num_after_skip):
                h = ResidualLayer(mdl.hidden)(h)
            return h

        if self.remat:
            pre = nn.remat(pre, prevent_cse=False)
            post = nn.remat(post, prevent_cse=False)

        x_ji, x_kj = pre(self, x, rbf)
        x_kj = self._triplet_pass(x_kj, sbf, idx_kj, idx_ji, t_mask,
                                  num_edges, basis_ctx=basis_ctx)
        return post(self, x_ji, x_kj, x)


class OutputPPBlock(nn.Module):
    hidden: int
    out_emb_channels: int
    out_dim: int
    num_output_layers: int
    # backward-pass remat (round 4): the int num_nodes arg rides a CLOSURE
    # (static by value) so the lifted transform never traces it
    remat: bool = False

    @nn.compact
    def __call__(self, x, rbf, receivers, num_nodes, edge_mask):
        go = glorot_orthogonal

        def inner(mdl, x, rbf, receivers, edge_mask):
            x = nn.Dense(mdl.hidden, use_bias=False,
                         kernel_init=go())(rbf) * x
            x = segment_sum(x, receivers, num_nodes, mask=edge_mask)
            x = nn.Dense(mdl.out_emb_channels, use_bias=False,
                         kernel_init=go())(x)
            for _ in range(mdl.num_output_layers):
                x = swish(nn.Dense(mdl.out_emb_channels,
                                   kernel_init=go())(x))
            return nn.Dense(mdl.out_dim, use_bias=False,
                            kernel_init=nn.initializers.zeros)(x)

        if self.remat:
            inner = nn.remat(inner, prevent_cse=False)
        return inner(self, x, rbf, receivers, edge_mask)


class DimeNetPPModel(nn.Module):
    """Constructor surface mirrors dimenet.py:15-33 (same defaults)."""

    hidden_channels: int = 128
    in_dim: int = 1
    out_dim: int = 1
    num_layers: int = 4
    int_emb_size: int = 64
    basis_emb_size: int = 8
    out_emb_channels: int = 256
    num_spherical: int = 7
    num_radial: int = 6
    cutoff: float = 10.0
    max_num_neighbors: int = 32
    envelope_exponent: int = 5
    num_before_skip: int = 1
    num_after_skip: int = 2
    num_output_layers: int = 3
    act: str = "swish"
    pool: str = "sum"
    # triplet-block size (see InteractionPPBlock.triplet_chunk)
    triplet_chunk: Optional[int] = None
    # With triplet_chunk set, also evaluate the [T, ns*nr] spherical basis
    # INSIDE the chunk bodies (round 4): at 100k-node boxes (18M triplets)
    # the materialized sbf alone is ~3 GB and fails compile-time buffer
    # planning; in-chunk evaluation keeps only the [E, ns*nr] radial table
    # and the [T] index arrays resident.  Exactness-tested vs the
    # materialized path (elementwise over T -> bitwise identical).
    sbf_in_chunk: bool = True
    # Rematerialize each interaction/output block in the backward pass
    # (round 4): the deep per-edge residual MLP chain holds ~150 live
    # [E, hidden] activations fwd+bwd — 108 GB at 100k nodes/1.35M edges
    # (measured via XLA memory_analysis) — which kills buffer planning.
    # Block-level remat trades recompute for holding only block-boundary
    # activations.  Numerics identical.
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        assert batch.triplets is not None, "DimeNet++ needs triplet indices"
        tri = batch.triplets
        pos = batch.pos
        j, i = batch.senders, batch.receivers

        dist = safe_norm(pos[i] - pos[j], axis=-1)
        in_chunk = self.triplet_chunk is not None and self.sbf_in_chunk
        basis_ctx = None
        if in_chunk:
            from ..ops.dimenet_basis import sph_bessel_rbf

            sbf = None
            basis_ctx = {
                "pos": pos,
                "rbf_sph": sph_bessel_rbf(dist, self.num_spherical,
                                          self.num_radial, self.cutoff),
                "idx_i": tri.idx_i, "idx_j": tri.idx_j, "idx_k": tri.idx_k,
                "ns": self.num_spherical,
            }
        else:
            # fork's angle-at-i convention (dimenet.py:86-90)
            pos_i = pos[tri.idx_i]
            pos_ji = pos[tri.idx_j] - pos_i
            pos_ki = pos[tri.idx_k] - pos_i
            a = jnp.sum(pos_ji * pos_ki, axis=-1)
            b = safe_norm(jnp.cross(pos_ji, pos_ki), axis=-1)
            angle = safe_arctan2(b, a)
            sbf = AngleEmb(self.num_spherical, self.num_radial, self.cutoff,
                           name="sbf")(dist, angle, tri.idx_kj)

        rbf = DistEmb(self.num_radial, self.cutoff, self.envelope_exponent,
                      zero_outside=True, name="rbf")(dist)

        # output blocks stay un-remat'ed: their int num_nodes arg fights
        # the lifted-remat tracer rules, and they hold only a handful of
        # [E, *] temps next to the interaction blocks' dozens; the
        # interaction blocks remat their pre/post edge-MLP stages
        # internally (InteractionPPBlock.remat)
        Inter = InteractionPPBlock
        Out = OutputPPBlock
        x = EmbeddingBlock(self.hidden_channels, name="emb")(
            batch.atoms, rbf, j, i
        )
        P = Out(
            self.hidden_channels, self.out_emb_channels, self.out_dim,
            self.num_output_layers, remat=self.remat_blocks, name="output_0",
        )(x, rbf, i, batch.num_nodes, batch.edge_mask)

        for blk in range(self.num_layers):
            x = Inter(
                self.hidden_channels, self.int_emb_size, self.basis_emb_size,
                self.num_before_skip, self.num_after_skip,
                triplet_chunk=self.triplet_chunk,
                remat=self.remat_blocks,
                name=f"interaction_{blk}",
            )(x, rbf, sbf, tri.idx_kj, tri.idx_ji, tri.t_mask,
              basis_ctx=basis_ctx)
            P = P + Out(
                self.hidden_channels, self.out_emb_channels, self.out_dim,
                self.num_output_layers, remat=self.remat_blocks,
                name=f"output_{blk + 1}",
            )(x, rbf, i, batch.num_nodes, batch.edge_mask)

        return POOL[self.pool](P, batch)
