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


def _edge_chunked(mdl, fn, chunk, outs_like, *arrays):
    """Run a row-independent per-edge stage ``fn(mdl, *chunk_arrays)`` in
    ``chunk``-row blocks inside an nn.scan with a rematerialized body — the
    mace_ff ``_conv`` pattern (nn/mace_blocks.py) applied to DimeNet's
    per-edge MLP chains (round-5 VERDICT item 2: the ~150 live [E, hidden]
    activations of the residual chains bounded to one chunk fwd AND bwd).

    ``fn`` must CREATE its submodules inside itself under fixed names so
    chunked and unchunked parameter trees match (flax lifted transforms
    cannot close over submodules).  ``outs_like``: number of outputs.
    Exact up to nothing: elementwise over rows -> bitwise identical."""
    E = arrays[0].shape[0]
    if chunk is None or E <= chunk:
        return fn(mdl, *arrays)
    n_chunks = -(-E // chunk)
    pad = n_chunks * chunk - E

    def pad_to(v):
        if not pad:
            return v
        tail = jnp.zeros((pad,) + v.shape[1:], v.dtype)
        return jnp.concatenate([v, tail], axis=0)

    xs = tuple(pad_to(v).reshape((n_chunks, chunk) + v.shape[1:])
               for v in arrays)

    def body(m, carry, z):
        out = fn(m, *z)
        return carry, out if isinstance(out, tuple) else (out,)

    body = nn.remat(body, prevent_cse=False)
    scan = nn.scan(body, variable_broadcast="params",
                   split_rngs={"params": False})
    _, ys = scan(mdl, 0, xs)
    # a body may emit a REPACKED leading dim (e.g. pairs of rows fused
    # into wider rows — bitcast-compatible); scale ``E`` accordingly.
    ys = tuple(
        y.reshape((n_chunks * y.shape[1],) + y.shape[2:])
        [: E * y.shape[1] // chunk]
        for y in ys)
    return ys if outs_like > 1 else ys[0]



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
    # num_spherical, STATIC (module field, not basis_ctx payload): under
    # lifted transforms (nn.remat of the whole block, round 5) every
    # basis_ctx leaf is traced, and the Legendre table builder needs a
    # python int.
    ns: int = 7

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

        ns = self.ns

        def sbf_of(ctx, kj, ii, jj, kk):
            from ..ops.dimenet_basis import angle_cbf, sph_bessel_rbf

            pos = ctx["pos"]
            pos_i = pos[ii]
            pos_ji = pos[jj] - pos_i
            pos_ki = pos[kk] - pos_i
            a = jnp.sum(pos_ji * pos_ki, axis=-1)
            b = safe_norm(jnp.cross(pos_ji, pos_ki), axis=-1)
            angle = safe_arctan2(b, a)
            cbf = angle_cbf(angle, ns)                     # [c, ns]
            if "rbf_sph" in ctx:
                rs = ctx["rbf_sph"][kj]                    # [c, ns*nr]
            else:
                # 100k regime: the [E, ns*nr] table itself is ~0.24 GB —
                # gather the scalar dist and evaluate the Bessel basis on
                # the chunk instead (exact: elementwise over rows)
                rs = sph_bessel_rbf(ctx["dist"][kj], ns,
                                    ctx["nr"], ctx["cutoff"])
            out = rs.reshape(rs.shape[0], ns, -1) * cbf[:, :, None]
            return out.reshape(rs.shape[0], -1)

        T = idx_kj.shape[0]
        C = self.triplet_chunk
        # TPU gather/scatter row-width cliff (round-5 root cause of the
        # "narrow 2x slower" anomaly, scripts/trial_dimenet_narrow.py +
        # the width isolation in RESULTS.md): rows narrower than 64 f32
        # (256 B) hit a ~3.2x SLOWER absolute path in the scatter/gather
        # lowering (W=32: 506 ms vs W=64: 159 ms for the same 5.4M-triplet
        # schedule — half the data, triple the time; W=64 == W=128).
        # Zero-pad the triplet pass to 64 columns and slice back: exact,
        # 2x logical traffic, 3x measured win.
        MIN_W = 64
        padw = MIN_W - self.int_emb_size if self.int_emb_size < MIN_W else 0
        if padw:
            x_kj = jnp.pad(x_kj, ((0, 0), (0, padw)))

        def proj_p(mdl, sb):
            p = proj(mdl, sb)
            return jnp.pad(p, ((0, 0), (0, padw))) if padw else p

        if C is None or T <= C:
            if sbf is None:
                sbf = sbf_of(basis_ctx, idx_kj, basis_ctx["idx_i"],
                             basis_ctx["idx_j"], basis_ctx["idx_k"])
            y = x_kj[idx_kj] * proj_p(self, sbf)
            out = segment_sum(y, idx_ji, num_edges, mask=t_mask)
            return out[:, : self.int_emb_size] if padw else out
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
            y = x_kj[kj] * proj_p(mdl, sb)
            return segment_sum_into(acc, y, ji, mask=m), ()

        body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False})
        acc0 = jnp.zeros((num_edges, self.int_emb_size + padw), x_kj.dtype)
        acc, _ = scan(self, acc0, tuple(xs))
        return acc[:, : self.int_emb_size] if padw else acc

    # Rematerialize the per-edge MLP stages around the triplet pass in the
    # backward pass (round 4, 100k-box regime): the interaction blocks'
    # residual chains are most of the ~150 live [E, hidden] activations
    # that blow past HBM at 1.35M edges (XLA memory_analysis: 108 GB).
    # Method-level remat (same pattern as the triplet-scan body) keeps the
    # parameter tree identical to the plain path.  Numerics identical.
    remat: bool = False
    # Round-5 (VERDICT item 2): run the pre/post per-edge MLP chains in
    # edge blocks (nn.scan + remat, _edge_chunked) so the live per-edge
    # working set is one chunk, not the whole chain — the 100k-box enabler.
    edge_chunk: Optional[int] = None

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

        if self.edge_chunk is not None:
            # pack pairs of int_emb-wide rows into 128-wide rows INSIDE the
            # chunk body (pure bitcast both ways): the saved x_kj residual
            # stacks otherwise tile-pad 64 -> 128 lanes, 2x their bytes
            # (4 x 672 MB at the 100k box)
            f = max(128 // self.int_emb_size, 1)
            if self.edge_chunk % f or num_edges % f:
                f = 1

            def pre_packed(mdl, x, rbf):
                x_ji, x_kj = pre(mdl, x, rbf)
                if f > 1:
                    x_kj = x_kj.reshape(x_kj.shape[0] // f,
                                        f * x_kj.shape[1])
                return x_ji, x_kj

            x_ji, x_kj = _edge_chunked(self, pre_packed, self.edge_chunk,
                                       2, x, rbf)
            if f > 1:
                x_kj = x_kj.reshape(x_kj.shape[0] * f,
                                    x_kj.shape[1] // f)
        else:
            if self.remat:
                pre = nn.remat(pre, prevent_cse=False)
            x_ji, x_kj = pre(self, x, rbf)
        x_kj = self._triplet_pass(x_kj, sbf, idx_kj, idx_ji, t_mask,
                                  num_edges, basis_ctx=basis_ctx)
        if self.edge_chunk is not None:
            return _edge_chunked(self, post, self.edge_chunk, 1,
                                 x_ji, x_kj, x)
        if self.remat:
            post = nn.remat(post, prevent_cse=False)
        return post(self, x_ji, x_kj, x)


class OutputPPBlock(nn.Module):
    hidden: int
    out_emb_channels: int
    out_dim: int
    num_output_layers: int
    # backward-pass remat (round 4): the int num_nodes arg rides a CLOSURE
    # (static by value) so the lifted transform never traces it
    remat: bool = False
    # round-5: accumulate the rbf-gated edge stage per edge chunk
    # (segment_sum_into into the [N, hidden] carry) so no full-E
    # intermediate exists; explicit Dense_N names keep the parameter tree
    # identical to the historical auto-named unchunked tree.
    edge_chunk: Optional[int] = None

    @nn.compact
    def __call__(self, x, rbf, receivers, num_nodes, edge_mask):
        go = glorot_orthogonal

        def edge_gate(mdl, x, rbf):
            return nn.Dense(mdl.hidden, use_bias=False,
                            kernel_init=go(), name="Dense_0")(rbf) * x

        def node_mlp(mdl, x):
            x = nn.Dense(mdl.out_emb_channels, use_bias=False,
                         kernel_init=go(), name="Dense_1")(x)
            for k in range(mdl.num_output_layers):
                x = swish(nn.Dense(mdl.out_emb_channels, kernel_init=go(),
                                   name=f"Dense_{2 + k}")(x))
            return nn.Dense(
                mdl.out_dim, use_bias=False,
                kernel_init=nn.initializers.zeros,
                name=f"Dense_{2 + mdl.num_output_layers}")(x)

        E = x.shape[0]
        C = self.edge_chunk
        if C is not None and E > C:
            n_chunks = -(-E // C)
            pad = n_chunks * C - E

            def pad_to(v, fill=0):
                if not pad:
                    return v
                tail = jnp.full((pad,) + v.shape[1:], fill, v.dtype)
                return jnp.concatenate([v, tail], axis=0)

            xs = (pad_to(x).reshape(n_chunks, C, -1),
                  pad_to(rbf).reshape(n_chunks, C, -1),
                  pad_to(receivers).reshape(n_chunks, C),
                  pad_to(edge_mask, False).reshape(n_chunks, C))

            def body(mdl, acc, z):
                xc, rc, ridx, m = z
                return segment_sum_into(
                    acc, edge_gate(mdl, xc, rc), ridx, mask=m), ()

            body = nn.remat(body, prevent_cse=False)
            scan = nn.scan(body, variable_broadcast="params",
                           split_rngs={"params": False})
            acc0 = jnp.zeros((num_nodes, self.hidden), x.dtype)
            acc, _ = scan(self, acc0, xs)
            return node_mlp(self, acc)

        def inner(mdl, x, rbf, receivers, edge_mask):
            x = edge_gate(mdl, x, rbf)
            x = segment_sum(x, receivers, num_nodes, mask=edge_mask)
            return node_mlp(mdl, x)

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
    # Round-5 (VERDICT item 2): additionally run every per-edge MLP stage
    # (interaction pre/post chains, output-block edge gates) in edge
    # chunks (nn.scan + remat; _edge_chunked / the OutputPPBlock scan) —
    # live per-edge intermediates bounded to one chunk, the 100k enabler.
    edge_chunk: Optional[int] = None
    # Rematerialize each ENTIRE interaction block (pre + triplet pass +
    # post) as one unit: bwd saves only the block-boundary x instead of
    # x_ji / x_kj / the triplet accumulator per block (each a full-E
    # [E, hidden] array — the last ~1.6 GB past HBM at the 100k box even
    # with edge chunking).  Costs one extra triplet-pass forward per
    # block in bwd.  Numerics identical.
    remat_full_blocks: bool = False
    # 100k regime: evaluate the radial Bessel half of the spherical basis
    # per triplet chunk (from the scalar dist) instead of keeping the
    # [E, ns*nr] table resident (~0.24 GB at 1.35M edges).  Exact.
    rbf_in_chunk: bool = False
    # chunk the output-block edge gates too (default).  False keeps the
    # gates unchunked-but-remat'd: their chunk stacks otherwise pin a
    # SECOND copy of each block-boundary x (~0.7-1.3 GB apiece at 100k).
    chunk_output_blocks: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        assert batch.triplets is not None, "DimeNet++ needs triplet indices"
        tri = batch.triplets
        pos = batch.pos
        j, i = batch.senders, batch.receivers
        edge_mask = batch.edge_mask

        # Pad the edge axis ONCE to a chunk multiple (round-5): every
        # _edge_chunked reshape [E', d] <-> [n_chunks, C, d] is then a
        # COPY-FREE bitcast instead of a pad-copy per stage — at the 100k
        # box the per-stage pad copies were several live 704 MB
        # [11, 131072, 128] buffers, the last ~0.3 GB past HBM (measured
        # via compiled.memory_analysis).  Pad edges carry j = i = 0 and
        # mask False — the same sentinel discipline as batch padding;
        # triplet indices (< E) and node scatters are unaffected.
        if self.edge_chunk is not None:
            C_e = self.edge_chunk
            E0 = j.shape[0]
            E2 = -(-E0 // C_e) * C_e
            if E2 != E0:
                padn = E2 - E0
                j = jnp.concatenate([j, jnp.zeros(padn, j.dtype)])
                i = jnp.concatenate([i, jnp.zeros(padn, i.dtype)])
                edge_mask = jnp.concatenate(
                    [edge_mask, jnp.zeros(padn, bool)])

        # Same pad-once treatment for the TRIPLET axis: five [T] index
        # arrays each pad-copied per interaction block otherwise (~0.4 GB
        # of duplicate stacks at 18.5M triplets).
        idx_kj, idx_ji, t_mask = tri.idx_kj, tri.idx_ji, tri.t_mask
        idx_i, idx_j, idx_k = tri.idx_i, tri.idx_j, tri.idx_k
        if self.triplet_chunk is not None:
            T0 = idx_kj.shape[0]
            T2 = -(-T0 // self.triplet_chunk) * self.triplet_chunk
            if T2 != T0:
                padt = T2 - T0
                z = jnp.zeros(padt, idx_kj.dtype)
                idx_kj = jnp.concatenate([idx_kj, z])
                idx_ji = jnp.concatenate([idx_ji, z])
                idx_i = jnp.concatenate([idx_i, z])
                idx_j = jnp.concatenate([idx_j, z])
                idx_k = jnp.concatenate([idx_k, z])
                t_mask = jnp.concatenate(
                    [t_mask, jnp.zeros(padt, bool)])

        dist = safe_norm(pos[i] - pos[j], axis=-1)
        in_chunk = self.triplet_chunk is not None and self.sbf_in_chunk
        basis_ctx = None
        if in_chunk:
            from ..ops.dimenet_basis import sph_bessel_rbf

            sbf = None
            basis_ctx = {
                "pos": pos,
                "idx_i": idx_i, "idx_j": idx_j, "idx_k": idx_k,
            }
            if self.rbf_in_chunk:
                basis_ctx.update(dist=dist, nr=self.num_radial,
                                 cutoff=self.cutoff)
            else:
                basis_ctx["rbf_sph"] = sph_bessel_rbf(
                    dist, self.num_spherical, self.num_radial, self.cutoff)
        else:
            # fork's angle-at-i convention (dimenet.py:86-90)
            pos_i = pos[idx_i]
            pos_ji = pos[idx_j] - pos_i
            pos_ki = pos[idx_k] - pos_i
            a = jnp.sum(pos_ji * pos_ki, axis=-1)
            b = safe_norm(jnp.cross(pos_ji, pos_ki), axis=-1)
            angle = safe_arctan2(b, a)
            sbf = AngleEmb(self.num_spherical, self.num_radial, self.cutoff,
                           name="sbf")(dist, angle, idx_kj)

        rbf = DistEmb(self.num_radial, self.cutoff, self.envelope_exponent,
                      zero_outside=True, name="rbf")(dist)

        # output blocks stay un-remat'ed: their int num_nodes arg fights
        # the lifted-remat tracer rules, and they hold only a handful of
        # [E, *] temps next to the interaction blocks' dozens; the
        # interaction blocks remat their pre/post edge-MLP stages
        # internally (InteractionPPBlock.remat)
        # NOTE prevent_cse stays True (default) here: at the top level,
        # allowing CSE lets XLA share the bwd recompute with the forward
        # pass — which keeps every block's internals alive and DEFEATS the
        # remat (measured: 19.6 GB temp vs 12-13 GB with the barrier).
        Inter = (nn.remat(InteractionPPBlock)
                 if self.remat_full_blocks else InteractionPPBlock)
        Out = OutputPPBlock
        x = EmbeddingBlock(self.hidden_channels, name="emb")(
            batch.atoms, rbf, j, i
        )
        # Under whole-block remat the output blocks go UNCHUNKED but
        # remat'd: five chunked gate scans each pinned their own copy of
        # the x chunk-stack behind the remat barriers (~0.7 GB apiece at
        # the 100k box), while the unchunked gate holds one transient.
        out_chunk = (self.edge_chunk if self.chunk_output_blocks
                     and not self.remat_full_blocks else None)
        out_remat = (self.remat_blocks or self.remat_full_blocks
                     or not self.chunk_output_blocks)
        P = Out(
            self.hidden_channels, self.out_emb_channels, self.out_dim,
            self.num_output_layers, remat=out_remat,
            edge_chunk=out_chunk, name="output_0",
        )(x, rbf, i, batch.num_nodes, edge_mask)

        for blk in range(self.num_layers):
            x = Inter(
                self.hidden_channels, self.int_emb_size, self.basis_emb_size,
                self.num_before_skip, self.num_after_skip,
                triplet_chunk=self.triplet_chunk,
                remat=self.remat_blocks,
                edge_chunk=self.edge_chunk,
                ns=self.num_spherical,
                name=f"interaction_{blk}",
            )(x, rbf, sbf, idx_kj, idx_ji, t_mask,
              basis_ctx=basis_ctx)
            P = P + Out(
                self.hidden_channels, self.out_emb_channels, self.out_dim,
                self.num_output_layers, remat=out_remat,
                edge_chunk=out_chunk,
                name=f"output_{blk + 1}",
            )(x, rbf, i, batch.num_nodes, edge_mask)

        return POOL[self.pool](P, batch)
