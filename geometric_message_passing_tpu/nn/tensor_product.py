"""Edge-wise Clebsch-Gordan tensor product — THE hot kernel of TFN and MACE.

Replaces ``e3nn.o3.FullyConnectedTensorProduct(in_irreps, sh_irreps,
out_irreps, shared_weights=False)`` as used at
/root/reference/models/layers/tfn_layer.py:68-77,85.

TPU-first design: instead of e3nn's per-path codegen, features are laid out
as [E, mul, 2l+1] blocks and each CG path becomes
    tmp[e,u,m3] = x[e,u,m1] sh[e,m2] C[m1,m2,m3]       (small VPU contraction)
    out[e,w,m3] = W_p[e,u,w] tmp[e,u,m3]                (batched MXU matmul)
so the FLOPs land on the MXU with mul x mul operands.  Paths sharing an
output irrep are accumulated.  The per-edge weights come flat from an edge
MLP (weight_numel = sum_p mul_in*mul_out), in path-enumeration order.

Normalization follows e3nn defaults (irrep_normalization='component',
path_normalization='element'): path_weight = sqrt((2l3+1)/fan_in) folded in.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..irreps import Irreps, tp_paths, wigner_3j
from .equivariant import merge_blocks, split_blocks


def _combined_cg(paths, irreps_in: Irreps, irreps_sh: Irreps,
                 scale: float = 1.0) -> np.ndarray:
    """Block-sparse combined CG constant C[a, b, M] with path weights folded
    in: a indexes the per-channel input layout (sum_i d_i over irreps_in),
    b the SH dim, and M enumerates (path, m3) pairs in ``paths`` order.

    ONE einsum ``tmp[e,u,M] = x[e,u,a] sh[e,b] C[a,b,M]`` then replaces the
    per-path CG contractions — at MACE max_ell=3 this collapses ~34 einsum
    kernels (68 with bwd) per conv into 2 dot_generals, which is the
    dominant compile-time/kernel-count cost on TPU (per-path HLO explosion;
    the aggregate intermediate [E,u,sum_p d3] is byte-identical to the sum
    of the old per-path tmps, so peak memory is unchanged)."""
    a_off = []
    ix = 0
    for _, ir in irreps_in:
        a_off.append(ix)
        ix += ir.dim
    L = ix
    sh_off = []
    ix = 0
    for mul, ir in irreps_sh:
        sh_off.append(ix)
        ix += mul * ir.dim
    S = ix
    M = sum(p.ir_out.dim for p in paths)
    C = np.zeros((L, S, M), dtype=np.float32)
    m = 0
    for p in paths:
        w3j = wigner_3j(p.ir_in1.l, p.ir_in2.l, p.ir_out.l)
        d1, d2, d3 = p.ir_in1.dim, p.ir_in2.dim, p.ir_out.dim
        a0, b0 = a_off[p.i_in1], sh_off[p.i_in2]
        C[a0 : a0 + d1, b0 : b0 + d2, m : m + d3] = (
            p.path_weight * scale
        ) * w3j
        m += d3
    return C


def _to_channel_layout(x, irreps: Irreps):
    """Flat [E, sum mul*d] -> [E, mul, sum d] (uniform mul)."""
    return jnp.concatenate(split_blocks(x, irreps), axis=-1)


class EdgeTensorProduct:
    """Stateless descriptor + apply for the fully-connected edge TP.

    Build once per layer (python time); ``apply`` is pure jnp.
    """

    def __init__(self, irreps_in: Irreps, irreps_sh: Irreps, irreps_out: Irreps,
                 path_weight_scale: float = 1.0, precision=None):
        """``path_weight_scale`` rescales every path weight uniformly — used
        by tensor parallelism, where each shard sees 1/k of the input
        multiplicity so the locally computed fan-in normalization must be
        corrected by 1/sqrt(k) to match the full model.

        ``precision``: jax matmul precision for the TP einsums (both the CG
        stage and the per-edge weight contraction).  TPU f32 einsums default
        to ONE bf16 MXU pass per operand; the reference's numerics are true
        torch f32, and the TP->contraction chain is the precision-sensitive
        core of MACE (measured: star MAE 0.0832 default vs 0.0775 f32,
        ref 0.0766 — RESULTS.md round-3 precision ablation).  'highest'
        scopes exact-f32 passes to just these einsums."""
        self.irreps_in = Irreps(irreps_in)
        self.irreps_sh = Irreps(irreps_sh)
        self.irreps_out = Irreps(irreps_out)
        self.path_weight_scale = float(path_weight_scale)
        self.precision = precision
        paths = tp_paths(self.irreps_in, self.irreps_sh, self.irreps_out)
        # group paths by output irrep (stable): makes both the weight layout
        # and the combined-CG M axis contiguous per i_out, so the second
        # stage is one slice + one dot_general per output irrep.
        self.paths = sorted(paths, key=lambda p: p.i_out)
        assert all(p.mul_in2 == 1 for p in self.paths), "SH multiplicity must be 1"
        self.weight_numel = sum(p.mul_in1 * p.mul_out for p in self.paths)
        # SH block offsets
        self._sh_offsets = []
        ix = 0
        for mul, ir in self.irreps_sh:
            self._sh_offsets.append((ix, ir.dim))
            ix += mul * ir.dim
        # combined fast path (uniform input multiplicity — always true for
        # the model zoo: first conv has a single irrep, hidden convs uniform)
        muls = {mul for mul, _ in self.irreps_in}
        self._uniform_mul = muls.pop() if len(muls) == 1 else None
        if self._uniform_mul is not None:
            self._C = _combined_cg(self.paths, self.irreps_in, self.irreps_sh,
                                   self.path_weight_scale)
            # per-output-irrep group metadata: (i_out, n_paths, m_start, w_start)
            self._groups = []
            m = w = 0
            for i_out, (mul_o, ir_o) in enumerate(self.irreps_out):
                pids = [p for p in self.paths if p.i_out == i_out]
                if pids:
                    self._groups.append(
                        (i_out, len(pids), m, w, ir_o.dim, pids[0].mul_in1,
                         mul_o)
                    )
                    m += len(pids) * ir_o.dim
                    w += sum(p.mul_in1 * p.mul_out for p in pids)

    def apply(self, x, sh, weights):
        """x: [E, irreps_in.dim]; sh: [E, irreps_sh.dim];
        weights: [E, weight_numel].  Returns [E, irreps_out.dim]."""
        if self._uniform_mul is not None:
            return self._apply_combined(x, sh, weights)
        return self._apply_per_path(x, sh, weights)

    @property
    def group_weight_numels(self):
        """Per-output-irrep-group weight widths, in ``_groups`` order (the
        flat weight vector is their concatenation)."""
        if self._uniform_mul is None:
            return [self.weight_numel]
        u = self._uniform_mul
        return [n_p * u * mul_o for _, n_p, _, _, _, _, mul_o in self._groups]

    def apply_grouped(self, x, sh, ws):
        """Like ``apply`` but takes the per-edge weights PRE-SPLIT per
        output-irrep group (list in ``_groups`` order, widths
        ``group_weight_numels``; intra-group layout unchanged: path-major,
        then [u, w] row-major).

        Feeding the groups straight from per-group producer matmuls avoids
        slicing a materialized [E, sum_p u*w] giant — on TPU each such slice
        compiled to a full copy (+ a relayout for the batched dot), ~1.1 GB
        of pure copy traffic per TFN train step (RESULTS.md)."""
        if self._uniform_mul is None:
            return self._apply_per_path(x, sh, jnp.concatenate(ws, axis=-1))
        return self._apply_combined(x, sh, None, ws=ws)

    def _apply_combined(self, x, sh, weights, ws=None):
        """Stage 1: one 3-operand einsum over the combined CG constant.
        Stage 2: one batched matmul per output irrep over the CONTIGUOUS
        k=(path,u) axis — the per-edge weight block [E, n_p*u*w] reshapes
        freely to [E, (p,u), w] (its native flat layout), so XLA emits the
        dot with no relayout of the big tensor; only the small CG
        intermediate is transposed."""
        u = self._uniform_mul
        xr = _to_channel_layout(x, self.irreps_in)        # [E, u, L]
        C = jnp.asarray(self._C, dtype=x.dtype)
        tmp = jnp.einsum("...ua,...b,abm->...um", xr, sh, C,
                         precision=self.precision)        # [E, u, M]
        outs = [None] * len(self.irreps_out)
        for g, (i_out, n_p, m0, w0, d3, _, mul_o) in enumerate(self._groups):
            T = tmp[..., m0 : m0 + n_p * d3].reshape(
                tmp.shape[:-1] + (n_p, d3)
            )                                             # [E, u, P, d3]
            T = jnp.swapaxes(T, -3, -2).reshape(
                tmp.shape[:-2] + (n_p * u, d3)
            )                                             # [E, (p,u), d3]
            nW = n_p * u * mul_o
            W = ws[g] if ws is not None else weights[..., w0 : w0 + nW]
            W = W.reshape(W.shape[:-1] + (n_p * u, mul_o))  # [E, (p,u), w]
            outs[i_out] = jnp.einsum("...km,...kw->...wm", T, W,
                                     precision=self.precision)
        for k, (mul, ir) in enumerate(self.irreps_out):
            if outs[k] is None:
                outs[k] = jnp.zeros(x.shape[:-1] + (mul, ir.dim), x.dtype)
        return merge_blocks(outs)

    def _apply_per_path(self, x, sh, weights):
        """Fallback for non-uniform input multiplicities: per-path CG
        contraction, paths feeding one output irrep stacked along the
        input-mul axis into one batched matmul per output irrep."""
        xs = split_blocks(x, self.irreps_in)
        groups = {}   # i_out -> ([tmp...], [W...])
        w_off = 0
        for p in self.paths:
            xin = xs[p.i_in1]                       # [E, u, d1]
            off, d2 = self._sh_offsets[p.i_in2]
            sh_blk = sh[..., off : off + d2]        # [E, d2]
            C = jnp.asarray(
                wigner_3j(p.ir_in1.l, p.ir_in2.l, p.ir_out.l), dtype=x.dtype
            )
            nW = p.mul_in1 * p.mul_out
            W = weights[..., w_off : w_off + nW].reshape(
                weights.shape[:-1] + (p.mul_in1, p.mul_out)
            )
            w_off += nW
            tmp = (p.path_weight * self.path_weight_scale) * jnp.einsum(
                "...ua,...b,abm->...um", xin, sh_blk, C,
                precision=self.precision
            )
            g = groups.setdefault(p.i_out, ([], []))
            g[0].append(tmp)
            g[1].append(W)
        outs = [None] * len(self.irreps_out)
        for i_out, (tmps, ws) in groups.items():
            T = tmps[0] if len(tmps) == 1 else jnp.concatenate(tmps, axis=-2)
            W = ws[0] if len(ws) == 1 else jnp.concatenate(ws, axis=-2)
            outs[i_out] = jnp.einsum("...xw,...xm->...wm", W, T,
                                     precision=self.precision)
        for k, (mul, ir) in enumerate(self.irreps_out):
            if outs[k] is None:
                outs[k] = jnp.zeros(x.shape[:-1] + (mul, ir.dim), x.dtype)
        return merge_blocks(outs)


@functools.lru_cache(maxsize=None)
def edge_tensor_product(irreps_in: Irreps, irreps_sh: Irreps,
                        irreps_out: Irreps) -> EdgeTensorProduct:
    return EdgeTensorProduct(irreps_in, irreps_sh, irreps_out)


class EdgeTensorProductUVU:
    """'uvu'-mode edge tensor product with per-edge weights — the conv_tp of
    the MACE interaction blocks (o3.TensorProduct with
    tp_out_irreps_with_instructions, blocks.py:218-225).

    Weight layout: per path, mul_in1 weights (mul_in2 == 1), path order.
    Output: the UNSIMPLIFIED sorted irreps_out from tp_paths_uvu.
    """

    def __init__(self, irreps_in: Irreps, irreps_sh: Irreps, target: Irreps,
                 precision=None, grouping: Optional[str] = None):
        from ..irreps import tp_paths_uvu

        self.precision = precision
        self.irreps_in = Irreps(irreps_in)
        self.irreps_sh = Irreps(irreps_sh)
        self.irreps_out, self.paths = tp_paths_uvu(
            self.irreps_in, self.irreps_sh, Irreps(target)
        )
        assert all(p.mul_in2 == 1 for p in self.paths)
        # each 'uvu' path owns its output slot; ordering paths by slot makes
        # the combined-CG M axis match the merged output layout directly.
        self.paths = sorted(self.paths, key=lambda p: p.i_out)
        self.weight_numel = sum(p.mul_in1 for p in self.paths)
        self.grouping = self.LARGE_GROUPING if grouping is None else grouping
        self._sh_offsets = []
        ix = 0
        for mul, ir in self.irreps_sh:
            self._sh_offsets.append((ix, ir.dim))
            ix += mul * ir.dim
        muls = {mul for mul, _ in self.irreps_in}
        self._uniform_mul = muls.pop() if len(muls) == 1 else None
        if self._uniform_mul is not None:
            self._C = _combined_cg(self.paths, self.irreps_in, self.irreps_sh)
            self._d3 = np.array([p.ir_out.dim for p in self.paths])
            # (l1, l2)-pair groups for the at-scale form: all l3 outputs of
            # one operand pair batched into ONE einsum (zero FLOP waste —
            # the per-path einsum is already dense over its (d1,d2,d3)
            # block), with the per-path 'uvu' weights applied as one fused
            # multiply per group.  34 -> 16 contractions at lmax 3, and
            # each input/SH block is read once per PAIR instead of once per
            # path (round-5 VERDICT item 1).
            by_pair = {}
            for k, p in enumerate(self.paths):
                by_pair.setdefault((p.i_in1, p.i_in2), []).append(k)
            w_offs = np.concatenate(
                [[0], np.cumsum([p.mul_in1 for p in self.paths])])
            self._pair_groups = []
            for (i1, i2), pids in by_pair.items():
                d1 = self.irreps_in[i1][1].dim
                d2 = self.irreps_sh[i2][1].dim
                d3s = np.array([self.paths[k].ir_out.dim for k in pids])
                Cg = np.zeros((d1, d2, int(d3s.sum())), dtype=np.float32)
                m = 0
                for k in pids:
                    p = self.paths[k]
                    w3j = wigner_3j(p.ir_in1.l, p.ir_in2.l, p.ir_out.l)
                    Cg[:, :, m : m + p.ir_out.dim] = p.path_weight * w3j
                    m += p.ir_out.dim
                self._pair_groups.append(
                    (i1, i2, pids, Cg, d3s,
                     [int(w_offs[k]) for k in pids]))

    # Above this edge count the per-path form wins: the combined-CG stage
    # contracts a DENSE [L, S, M] constant (~94% zeros at lmax 3) — the
    # right trade in the toy regime where steps are KERNEL-COUNT-bound,
    # but ~17x the necessary FLOPs once the chip has real work per launch
    # (measured: mace_ff molecular boxes, RESULTS.md round 3).  Per-path
    # contracts only the allowed (l1,l2,l3) blocks.
    COMBINED_MAX_EDGES = 4096   # toy batches ~1.3-4.2k edges stay combined;
    #                             scale chunks (>=8192) go pair-grouped

    # At-scale contraction strategy (round-5 on-chip shootout,
    # scripts/trial_tp_uminor.py, 16x8192-edge chunks, MACE lmax3 shapes,
    # fwd+bwd under remat):
    #   'bcast' 88 ms   (default) — broadcast-multiply-reduce, VPU-lowered
    #   'path'  226 ms  — one einsum per path (per-edge batched dots with
    #                     k=d1<=7 run at ~100 GFLOP/s on the MXU)
    #   'pair'  (l1,l2)-grouped einsums — 8% slower than 'path'
    #   dense combined: 488 ms at 'highest' (17x FLOPs x 6 passes)
    # 'bcast' contracts the tiny CG axes as fused elementwise + small-axis
    # reduces instead of batched matmuls — bandwidth-bound AND exact f32
    # (no MXU bf16 operand rounding), so it is both the fastest and the
    # most precise form; the timing is identical with precision=None vs
    # 'highest'.  All three are exactness-tested twins.
    LARGE_GROUPING = "bcast"

    def apply(self, x, sh, weights):
        large = x.shape[0] > self.COMBINED_MAX_EDGES
        if self._uniform_mul is not None and not large:
            return self._apply_combined(x, sh, weights)
        if self._uniform_mul is not None and self.grouping == "bcast":
            return self._apply_bcast(x, sh, weights)
        if self._uniform_mul is not None and self.grouping == "pair":
            return self._apply_pair_grouped(x, sh, weights)
        return self._apply_per_path(x, sh, weights)

    def _apply_bcast(self, x, sh, weights):
        """Per-path broadcast-multiply-reduce form: K_p = sh . w3j (a small
        [E,d2]x[d2,d1*d3] GEMM), then y_p = sum_a x[...,u,a,None] *
        K_p[...,None,a,:] as a FUSED elementwise multiply + length-d1
        reduce on the VPU.  The CG contraction axes (d1,d2 <= 7) are far
        below the MXU tile, so the batched-dot lowering of the einsum
        forms runs at ~100 GFLOP/s; this form is bandwidth-bound instead
        (2.6x faster measured) and numerically EXACT f32 — the elementwise
        products never touch the MXU's bf16 operand rounding."""
        xs = split_blocks(x, self.irreps_in)
        outs = [None] * len(self.irreps_out)
        w_off = 0
        for p in self.paths:
            xin = xs[p.i_in1]                         # [E, u, d1]
            off, d2 = self._sh_offsets[p.i_in2]
            sh_blk = sh[..., off : off + d2]          # [E, d2]
            C = jnp.asarray(
                wigner_3j(p.ir_in1.l, p.ir_in2.l, p.ir_out.l), dtype=x.dtype
            )
            K = jnp.einsum("...b,abm->...am", sh_blk, C,
                           precision=self.precision)  # [E, d1, d3]
            W = weights[..., w_off : w_off + p.mul_in1]   # [E, u]
            w_off += p.mul_in1
            y = (xin[..., :, :, None] * K[..., None, :, :]).sum(-2)
            y = p.path_weight * y * W[..., None]
            outs[p.i_out] = y if outs[p.i_out] is None else outs[p.i_out] + y
        for k, (mul, ir) in enumerate(self.irreps_out):
            if outs[k] is None:
                outs[k] = jnp.zeros(x.shape[:-1] + (mul, ir.dim), x.dtype)
        return merge_blocks(outs)

    def _apply_combined(self, x, sh, weights):
        """One combined-CG einsum + one broadcast multiply by the per-edge
        'uvu' weights; the M axis is already in output-slot order so the
        result only needs the [u, d3]-per-slot flattening."""
        u = self._uniform_mul
        P = len(self.paths)
        xr = _to_channel_layout(x, self.irreps_in)            # [E, u, L]
        C = jnp.asarray(self._C, dtype=x.dtype)
        tmp = jnp.einsum("...ua,...b,abm->...um", xr, sh, C,
                         precision=self.precision)            # [E, u, M]
        W = weights.reshape(weights.shape[:-1] + (P, u))      # [E, P, u]
        W = jnp.repeat(jnp.swapaxes(W, -1, -2), self._d3, axis=-1,
                       total_repeat_length=int(self._d3.sum()))  # [E, u, M]
        y = tmp * W
        # merge: per slot [E, u, d3] -> [E, u*d3], concat (slots == paths)
        m0s = np.concatenate([[0], np.cumsum(self._d3)[:-1]])
        return merge_blocks(
            [y[..., m0 : m0 + d3] for m0, d3 in zip(m0s, self._d3)]
        )

    def _apply_pair_grouped(self, x, sh, weights):
        """One einsum per (l1, l2) operand pair covering ALL its l3 outputs
        (exact-FLOP batching of the per-path form), then one fused multiply
        by the d3-repeated 'uvu' weights per group.  Outputs land in their
        slots exactly as in ``_apply_per_path``."""
        u = self._uniform_mul
        xs = split_blocks(x, self.irreps_in)
        outs = [None] * len(self.irreps_out)
        for i1, i2, pids, Cg, d3s, woffs in self._pair_groups:
            xin = xs[i1]                              # [E, u, d1]
            off, d2 = self._sh_offsets[i2]
            sh_blk = sh[..., off : off + d2]          # [E, d2]
            C = jnp.asarray(Cg, dtype=x.dtype)
            tmp = jnp.einsum("...ua,...b,abm->...um", xin, sh_blk, C,
                             precision=self.precision)   # [E, u, M_g]
            W = jnp.stack(
                [weights[..., o : o + u] for o in woffs], axis=-1
            )                                         # [E, u, P_g]
            Wr = jnp.repeat(W, d3s, axis=-1,
                            total_repeat_length=int(d3s.sum()))
            y = tmp * Wr
            m = 0
            for k, d3 in zip(pids, d3s):
                slot = self.paths[k].i_out
                yk = y[..., m : m + int(d3)]
                outs[slot] = yk if outs[slot] is None else outs[slot] + yk
                m += int(d3)
        for k, (mul, ir) in enumerate(self.irreps_out):
            if outs[k] is None:
                outs[k] = jnp.zeros(x.shape[:-1] + (mul, ir.dim), x.dtype)
        return merge_blocks(outs)

    def _apply_per_path(self, x, sh, weights):
        xs = split_blocks(x, self.irreps_in)
        outs = [None] * len(self.irreps_out)
        w_off = 0
        for p in self.paths:
            xin = xs[p.i_in1]                        # [E, u, d1]
            off, d2 = self._sh_offsets[p.i_in2]
            sh_blk = sh[..., off : off + d2]
            C = jnp.asarray(
                wigner_3j(p.ir_in1.l, p.ir_in2.l, p.ir_out.l), dtype=x.dtype
            )
            W = weights[..., w_off : w_off + p.mul_in1]   # [E, u]
            w_off += p.mul_in1
            y = p.path_weight * jnp.einsum(
                "...ua,...b,abm,...u->...um", xin, sh_blk, C, W,
                precision=self.precision
            )
            outs[p.i_out] = y if outs[p.i_out] is None else outs[p.i_out] + y
        for k, (mul, ir) in enumerate(self.irreps_out):
            if outs[k] is None:
                outs[k] = jnp.zeros(x.shape[:-1] + (mul, ir.dim), x.dtype)
        return merge_blocks(outs)


class FullyConnectedTensorProduct(nn.Module):
    """Shared-internal-weight FCTP (e3nn o3.FullyConnectedTensorProduct with
    internal_weights=True) — the skip_tp of the interaction blocks
    (blocks.py:241-243). Typically in2 = one-hot element scalars.

    When in2 is all scalars (the model zoo's only use: one-hot elements),
    the CG collapses to identity on the in2 side and the whole TP runs as
    the combined-CG einsum of ``EdgeTensorProduct`` with x2 playing the
    per-item weight role; otherwise the per-path form below applies."""

    irreps_in1: Irreps
    irreps_in2: Irreps
    irreps_out: Irreps
    # node-block processing (round 3): the scalar-in2 fast path
    # materializes an O(n * u * M) intermediate — GBs at n >= 100k; blocks
    # are row-independent, so nn.scan + remat bounds the working set.
    node_chunk: Optional[int] = None

    @nn.compact
    def __call__(self, x1, x2):
        n = x1.shape[0]
        C = self.node_chunk
        if C is None or n <= C:
            return self._full(x1, x2)
        n_chunks = -(-n // C)
        pad = n_chunks * C - n

        def pad_to(x):
            if not pad:
                return x
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

        xs = (pad_to(x1).reshape((n_chunks, C) + x1.shape[1:]),
              pad_to(x2).reshape((n_chunks, C) + x2.shape[1:]))

        def body(mdl, carry, x):
            return carry, mdl._full(*x)

        body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False})
        _, out = scan(self, 0, xs)
        return out.reshape((n_chunks * C,) + out.shape[2:])[:n]

    def _full(self, x1, x2):
        from ..irreps import tp_paths

        in1, in2, out = (Irreps(self.irreps_in1), Irreps(self.irreps_in2),
                         Irreps(self.irreps_out))
        paths = sorted(tp_paths(in1, in2, out), key=lambda p: p.i_out)
        muls1 = {mul for mul, _ in in1}
        scalar_in2 = all(ir.l == 0 and ir.p == 1 for _, ir in in2)
        if scalar_in2 and len(muls1) == 1 and len(in2) == 1:
            return self._scalar_in2_combined(x1, x2, in1, in2, out, paths)
        return self._per_path(x1, x2, in1, in2, out, paths)

    def _scalar_in2_combined(self, x1, x2, in1, in2, out, paths):
        """x2: [N, v] scalars. out_i = sum_p pw C_p (x1_p ⊗ 1) W_p[u,v,w] x2_v
        — stage 1 is the combined-CG einsum with sh := ones (C absorbs the
        scalar), stage 2 one dot per output irrep with W folded over v."""
        u = in1[0][0]
        v = in2[0][0]
        C = _combined_cg(paths, in1, Irreps("1x0e"))      # [L, 1, M]
        xr = _to_channel_layout(x1, in1)                  # [N, u, L]
        tmp = jnp.einsum("...ua,am->...um", xr,
                         jnp.asarray(C[:, 0, :], dtype=x1.dtype))
        outs = [None] * len(out)
        mm = 0
        offs = []
        for p in paths:
            offs.append(mm)
            mm += p.ir_out.dim
        for i_out, (mul_o, ir_o) in enumerate(out):
            pids = [k for k, p in enumerate(paths) if p.i_out == i_out]
            if not pids:
                outs[i_out] = jnp.zeros(
                    x1.shape[:-1] + (mul_o, ir_o.dim), x1.dtype)
                continue
            n_p, u_ = len(pids), u
            T = jnp.concatenate(
                [tmp[..., offs[k] : offs[k] + ir_o.dim].reshape(
                    tmp.shape[:-1] + (1, ir_o.dim))
                 for k in pids], axis=-2)                 # [N, u, P, d3]
            # contiguous k=(p,u) contraction axis (see _apply_combined)
            T = jnp.swapaxes(T, -3, -2).reshape(
                T.shape[:-3] + (n_p * u_, ir_o.dim))      # [N, (p,u), d3]
            W = jnp.stack(
                [self.param(f"w{k}", nn.initializers.normal(stddev=1.0),
                            (paths[k].mul_in1, paths[k].mul_in2,
                             paths[k].mul_out))
                 for k in pids])                          # [P, u, v, w]
            Wx = jnp.einsum("...v,puvw->...puw", x2, W).reshape(
                x2.shape[:-1] + (n_p * u_, mul_o))        # [N, (p,u), w]
            outs[i_out] = jnp.einsum("...km,...kw->...wm", T, Wx)
        return merge_blocks(outs)

    def _per_path(self, x1, x2, in1, in2, out, paths):
        xs1 = split_blocks(x1, in1)
        xs2 = split_blocks(x2, in2)
        outs = [None] * len(out)
        for k, p in enumerate(paths):
            C = jnp.asarray(
                wigner_3j(p.ir_in1.l, p.ir_in2.l, p.ir_out.l), dtype=x1.dtype
            )
            W = self.param(
                f"w{k}", nn.initializers.normal(stddev=1.0),
                (p.mul_in1, p.mul_in2, p.mul_out),
            )
            y = p.path_weight * jnp.einsum(
                "...ua,...vb,abm,uvw->...wm", xs1[p.i_in1], xs2[p.i_in2], C, W
            )
            outs[p.i_out] = y if outs[p.i_out] is None else outs[p.i_out] + y
        for k, (mul, ir) in enumerate(out):
            if outs[k] is None:
                outs[k] = jnp.zeros(x1.shape[:-1] + (mul, ir.dim), x1.dtype)
        return merge_blocks(outs)
