"""Equivariant primitives over irreps-typed features.

Features are stored flat: [N, irreps.dim] with e3nn memory layout — per irrep
block, multiplicity-major ([mul, 2l+1] row-major).  This keeps the reference's
flat-feature idioms valid (zero-padding residuals at tfn.py:182, scalar slice
readout at mace.py:188).

Modules:
  * IrrepsLinear        — e3nn ``o3.Linear`` equivalent (blocks.py:121-123)
  * Gate                — e3nn ``nn.Gate``/``Activation`` (tfn_layer.py:45-63)
  * EquivariantBatchNorm— e3nn ``nn.BatchNorm`` (tfn_layer.py:80, mace default)
All redesigned for XLA: per-irrep blocked einsums, constants folded at trace.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..irreps import Irrep, Irreps


def split_blocks(x, irreps: Irreps) -> List[jnp.ndarray]:
    """Flat [N, irreps.dim] -> list of [N, mul, 2l+1] blocks."""
    out, ix = [], 0
    for mul, ir in irreps:
        d = mul * ir.dim
        out.append(x[..., ix : ix + d].reshape(x.shape[:-1] + (mul, ir.dim)))
        ix += d
    return out


def merge_blocks(blocks: List[jnp.ndarray]) -> jnp.ndarray:
    """Inverse of split_blocks."""
    flat = [b.reshape(b.shape[:-2] + (b.shape[-2] * b.shape[-1],)) for b in blocks]
    return jnp.concatenate(flat, axis=-1)


def scale_mul(irreps: Irreps, k: int) -> Irreps:
    """Multiply every multiplicity by k (full irreps of a k-way mul shard)."""
    return Irreps([(mul * k, ir) for mul, ir in irreps])


def shard_mul_slice(x, irreps_full: Irreps, tp_size: int, shard_index):
    """Take this shard's channel slice of a full-mul flat irreps array:
    block k of the mul axis of every irrep (``shard_index`` may be traced,
    e.g. ``lax.axis_index`` inside shard_map)."""
    import jax

    outs = []
    for blk, (mul, ir) in zip(split_blocks(x, irreps_full), irreps_full):
        loc = mul // tp_size
        outs.append(jax.lax.dynamic_slice_in_dim(
            blk, shard_index * loc, loc, axis=-2
        ))
    return merge_blocks(outs)


def reshape_irreps(x, irreps: Irreps) -> jnp.ndarray:
    """[N, sum mul*d] -> [N, mul, sum d] for uniform-mul irreps — the MACE
    feature layout (irreps_tools.py:63-79)."""
    muls = {mul for mul, _ in irreps}
    assert len(muls) == 1, f"reshape_irreps needs uniform multiplicity, got {irreps}"
    return jnp.concatenate(split_blocks(x, irreps), axis=-1)


def inverse_reshape_irreps(x, irreps: Irreps) -> jnp.ndarray:
    """[N, mul, sum d] -> flat [N, sum mul*d]."""
    out, ix = [], 0
    for mul, ir in irreps:
        blk = x[..., ix : ix + ir.dim]
        out.append(blk.reshape(blk.shape[:-2] + (mul * ir.dim,)))
        ix += ir.dim
    return jnp.concatenate(out, axis=-1)


def pad_to_irreps(x, target_dim: int) -> jnp.ndarray:
    """F.pad(h, (0, target - h.shape[-1])) — the reference residual trick
    (tfn.py:182, mace.py:181)."""
    pad = target_dim - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


class IrrepsLinear(nn.Module):
    """Per-irrep block linear map: out_k = sum_{i: ir_i==ir_k} W_ik x_i / sqrt(fan).

    e3nn o3.Linear semantics (internal weights N(0,1), path_normalization
    'element': fan = total input multiplicity feeding each output irrep).
    """

    irreps_in: Irreps
    irreps_out: Irreps
    fan_mult: int = 1   # tensor parallelism: true fan = local fan * fan_mult
    precision: Optional[str] = None  # jax matmul precision for the mixes

    @nn.compact
    def __call__(self, x):
        ins, outs_ir = Irreps(self.irreps_in), Irreps(self.irreps_out)
        # fast path: identical irrep lists (the common square map, e.g.
        # MACE product-basis -> hidden). One batched dot_general over the
        # per-channel column axis instead of one dot per irrep: the tiny
        # [u,w] params are repeated across each irrep's 2l+1 columns (cheap
        # param-side ops) and contracted in channel layout [n,u,L].
        if [ir for _, ir in ins] == [ir for _, ir in outs_ir] and \
                len({m for m, _ in ins}) == 1 and \
                len({m for m, _ in outs_ir}) == 1:
            u = ins[0][0]
            w = outs_ir[0][0]
            Ws = []
            for k, (_, ir) in enumerate(ins):
                W = self.param(
                    f"w{k}_{k}", nn.initializers.normal(stddev=1.0), (u, w)
                )
                fan = self.fan_mult * u
                Ws.append(jnp.repeat(
                    (W / math.sqrt(max(fan, 1)))[:, :, None], ir.dim, axis=2
                ))
            W_L = jnp.concatenate(Ws, axis=2)              # [u, w, L]
            xr = jnp.concatenate(split_blocks(x, ins), axis=-1)  # [n, u, L]
            y = jnp.einsum("...ua,uwa->...wa", xr, W_L,
                           precision=self.precision)
            return inverse_reshape_irreps(y, outs_ir)
        xs = split_blocks(x, self.irreps_in)
        outs = []
        for ko, (mul_out, ir_out) in enumerate(self.irreps_out):
            contrib = None
            fan = self.fan_mult * sum(
                mul for mul, ir in self.irreps_in if ir == ir_out
            )
            for ki, (mul_in, ir_in) in enumerate(self.irreps_in):
                if ir_in != ir_out:
                    continue
                W = self.param(
                    f"w{ki}_{ko}",
                    nn.initializers.normal(stddev=1.0),
                    (mul_in, mul_out),
                )
                y = jnp.einsum("...ud,uw->...wd", xs[ki], W,
                               precision=self.precision)
                contrib = y if contrib is None else contrib + y
            if contrib is None:
                contrib = jnp.zeros(x.shape[:-1] + (mul_out, ir_out.dim), x.dtype)
            else:
                contrib = contrib / math.sqrt(max(fan, 1))
            outs.append(contrib)
        return merge_blocks(outs)


@functools.lru_cache(maxsize=None)
def _act_second_moment(name: str) -> float:
    """1/sqrt(E_{x~N(0,1)}[act(x)^2]) — e3nn's normalize2mom constant."""
    from .basic import ACT

    import jax

    xs = np.linspace(-12, 12, 200001)
    w = np.exp(-0.5 * xs**2) / math.sqrt(2 * math.pi)
    # the first call can happen INSIDE a trace (e.g. under nn.remat in the
    # chunked edge conv) — force concrete evaluation of the constant
    with jax.ensure_compile_time_eval():
        ys = np.asarray(ACT[name](jnp.asarray(xs)))
    m2 = np.trapezoid(ys**2 * w, xs)
    return float(1.0 / math.sqrt(m2))


def irreps2gate(irreps: Irreps) -> Tuple[Irreps, Irreps, Irreps]:
    """Split into (scalars, gates, gated) — irreps_tools.py:82-97."""
    scalars, gated = [], []
    for mul, ir in irreps:
        (scalars if (ir.l == 0 and ir.p == 1) else gated).append((mul, ir))
    scalars = Irreps(scalars).simplify()
    gated = Irreps(gated).simplify()
    gates = Irreps([(mul, Irrep(0, 1)) for mul, _ in gated]).simplify()
    return scalars, gates, gated


class Gate(nn.Module):
    """e3nn-style gated nonlinearity. Input irreps: scalars + gates + gated
    (in that order). Scalars -> silu, gates -> sigmoid, gated tensors are
    multiplied by their sigmoid gate. Activations rescaled to preserve the
    second moment (e3nn normalize2mom).
    """

    irreps_scalars: Irreps
    irreps_gates: Irreps
    irreps_gated: Irreps
    act_scalars: str = "silu"
    act_gates: str = "sigmoid"

    @property
    def irreps_in(self) -> Irreps:
        return self.irreps_scalars + self.irreps_gates + self.irreps_gated

    @property
    def irreps_out(self) -> Irreps:
        return self.irreps_scalars + self.irreps_gated

    @nn.compact
    def __call__(self, x):
        from .basic import ACT

        ns = self.irreps_scalars.dim
        ng = self.irreps_gates.dim
        scalars = x[..., :ns]
        gates = x[..., ns : ns + ng]
        gated = x[..., ns + ng :]
        if ns:
            scalars = ACT[self.act_scalars](scalars) * _act_second_moment(
                self.act_scalars
            )
        if ng:
            gates = ACT[self.act_gates](gates) * _act_second_moment(self.act_gates)
            blocks = split_blocks(gated, self.irreps_gated)
            # pair gate scalars with gated channels in order (one gate per mul)
            out_blocks, off = [], 0
            for b in blocks:
                mul = b.shape[-2]
                g = gates[..., off : off + mul]
                off += mul
                out_blocks.append(b * g[..., None])
            gated = merge_blocks(out_blocks)
        return jnp.concatenate([scalars, gated], axis=-1)


class Activation(nn.Module):
    """Scalar-only equivariant activation (e3nn nn.Activation with one act)."""

    irreps: Irreps
    act: str = "silu"

    @nn.compact
    def __call__(self, x):
        from .basic import ACT

        assert all(ir.l == 0 for _, ir in self.irreps), self.irreps
        return ACT[self.act](x) * _act_second_moment(self.act)


class EquivariantBatchNorm(nn.Module):
    """e3nn nn.BatchNorm semantics: per-irrep RMS normalization with running
    stats; scalars also get mean subtraction; affine weight per mul (and bias
    for scalars). normalization='component', reduce='mean', momentum 0.1.
    """

    irreps: Irreps
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        blocks = split_blocks(x, self.irreps)
        outs = []
        for k, ((mul, ir), field) in enumerate(zip(self.irreps, blocks)):
            # field: [N, mul, d]
            is_scalar = ir.l == 0 and ir.p == 1
            ra_mean = self.variable(
                "batch_stats", f"mean{k}", lambda: jnp.zeros(mul)
            ) if is_scalar else None
            ra_var = self.variable(
                "batch_stats", f"var{k}", lambda: jnp.ones(mul)
            )
            if mask is not None:
                w = mask.astype(field.dtype)[:, None]
                denom = jnp.maximum(w.sum(), 1.0)
            if is_scalar:
                if train:
                    if mask is not None:
                        fm = (field[..., 0] * w).sum(0) / denom
                    else:
                        fm = field[..., 0].mean(0)
                    ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * fm
                else:
                    fm = ra_mean.value
                field = field - fm[:, None]
            if train:
                fn = jnp.mean(field**2, axis=-1)  # component norm [N, mul]
                if mask is not None:
                    fn = (fn * w).sum(0) / denom
                else:
                    fn = fn.mean(0)
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * fn
            else:
                fn = ra_var.value
            inv = (fn + self.eps) ** -0.5
            if self.affine:
                weight = self.param(f"weight{k}", nn.initializers.ones, (mul,))
                inv = inv * weight
            field = field * inv[:, None]
            if is_scalar and self.affine:
                bias = self.param(f"bias{k}", nn.initializers.zeros, (mul,))
                field = field + bias[:, None]
            outs.append(field)
        return merge_blocks(outs)
