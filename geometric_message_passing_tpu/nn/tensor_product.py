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
from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..irreps import Irreps, tp_paths, wigner_3j
from .equivariant import merge_blocks, split_blocks


class EdgeTensorProduct:
    """Stateless descriptor + apply for the fully-connected edge TP.

    Build once per layer (python time); ``apply`` is pure jnp.
    """

    def __init__(self, irreps_in: Irreps, irreps_sh: Irreps, irreps_out: Irreps,
                 path_weight_scale: float = 1.0):
        """``path_weight_scale`` rescales every path weight uniformly — used
        by tensor parallelism, where each shard sees 1/k of the input
        multiplicity so the locally computed fan-in normalization must be
        corrected by 1/sqrt(k) to match the full model."""
        self.irreps_in = Irreps(irreps_in)
        self.irreps_sh = Irreps(irreps_sh)
        self.irreps_out = Irreps(irreps_out)
        self.path_weight_scale = float(path_weight_scale)
        self.paths = tp_paths(self.irreps_in, self.irreps_sh, self.irreps_out)
        assert all(p.mul_in2 == 1 for p in self.paths), "SH multiplicity must be 1"
        self.weight_numel = sum(p.mul_in1 * p.mul_out for p in self.paths)
        # SH block offsets
        self._sh_offsets = []
        ix = 0
        for mul, ir in self.irreps_sh:
            self._sh_offsets.append((ix, ir.dim))
            ix += mul * ir.dim

    def apply(self, x, sh, weights):
        """x: [E, irreps_in.dim]; sh: [E, irreps_sh.dim];
        weights: [E, weight_numel].  Returns [E, irreps_out.dim].

        Paths feeding the same output irrep are STACKED along the input-mul
        axis and contracted with ONE batched matmul per output irrep
        (out = einsum(W_cat[e, sum_u, w], T_cat[e, sum_u, m3])) — the CG
        pieces stay small fusable VPU ops while the MXU sees a handful of
        large contractions instead of one per path.  At MACE max_ell=3 this
        cuts the per-conv dot_general count ~6x (compile time and
        kernel-count-bound runtime both drop)."""
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
                "...ua,...b,abm->...um", xin, sh_blk, C
            )
            g = groups.setdefault(p.i_out, ([], []))
            g[0].append(tmp)
            g[1].append(W)
        outs = [None] * len(self.irreps_out)
        for i_out, (tmps, ws) in groups.items():
            T = tmps[0] if len(tmps) == 1 else jnp.concatenate(tmps, axis=-2)
            W = ws[0] if len(ws) == 1 else jnp.concatenate(ws, axis=-2)
            outs[i_out] = jnp.einsum("...xw,...xm->...wm", W, T)
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

    def __init__(self, irreps_in: Irreps, irreps_sh: Irreps, target: Irreps):
        from ..irreps import tp_paths_uvu

        self.irreps_in = Irreps(irreps_in)
        self.irreps_sh = Irreps(irreps_sh)
        self.irreps_out, self.paths = tp_paths_uvu(
            self.irreps_in, self.irreps_sh, Irreps(target)
        )
        assert all(p.mul_in2 == 1 for p in self.paths)
        self.weight_numel = sum(p.mul_in1 for p in self.paths)
        self._sh_offsets = []
        ix = 0
        for mul, ir in self.irreps_sh:
            self._sh_offsets.append((ix, ir.dim))
            ix += mul * ir.dim

    def apply(self, x, sh, weights):
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
                "...ua,...b,abm,...u->...um", xin, sh_blk, C, W
            )
            outs[p.i_out] = y if outs[p.i_out] is None else outs[p.i_out] + y
        for k, (mul, ir) in enumerate(self.irreps_out):
            if outs[k] is None:
                outs[k] = jnp.zeros(x.shape[:-1] + (mul, ir.dim), x.dtype)
        return merge_blocks(outs)


class FullyConnectedTensorProduct(nn.Module):
    """Shared-internal-weight FCTP (e3nn o3.FullyConnectedTensorProduct with
    internal_weights=True) — the skip_tp of the interaction blocks
    (blocks.py:241-243). Typically in2 = one-hot element scalars."""

    irreps_in1: Irreps
    irreps_in2: Irreps
    irreps_out: Irreps

    @nn.compact
    def __call__(self, x1, x2):
        from ..irreps import tp_paths

        in1, in2, out = (Irreps(self.irreps_in1), Irreps(self.irreps_in2),
                         Irreps(self.irreps_out))
        paths = tp_paths(in1, in2, out)
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
