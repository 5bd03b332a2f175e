"""Geometric Vector Perceptron primitives (scalar, vector-channel tuples).

Functional redesign of /root/reference/models/layers/gvp_layer.py (drorlab
gvp-pytorch): features are (s, V) tuples with s: [N, ns], V: [N, nv, 3].
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .basic import (ACT, torch_linear_bias_init,
                    torch_linear_kernel_init)


def norm_no_nan(x, axis=-1, keepdims=False, eps=1e-8, sqrt=True):
    """Clamped L2 norm (gvp_layer.py:66-73)."""
    out = jnp.clip(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims), min=eps)
    return jnp.sqrt(out) if sqrt else out


def tuple_sum(*args):
    return tuple(map(sum, zip(*args)))


def tuple_cat(*args):
    s_args, v_args = list(zip(*args))
    return jnp.concatenate(s_args, axis=-1), jnp.concatenate(v_args, axis=-2)


def tuple_index(x, idx):
    return x[0][idx], x[1][idx]


def merge(s, v):
    """(s, V) -> flat [..., ns + 3*nv] (gvp_layer.py:90-98)."""
    v = v.reshape(v.shape[:-2] + (v.shape[-2] * 3,))
    return jnp.concatenate([s, v], axis=-1)


def split(x, nv: int):
    s = x[..., : -3 * nv]
    v = x[..., -3 * nv :].reshape(x.shape[:-1] + (nv, 3))
    return s, v


class GVP(nn.Module):
    """Geometric vector perceptron with optional vector gating
    (gvp_layer.py:101-170)."""

    in_dims: Tuple[int, int]
    out_dims: Tuple[int, int]
    h_dim: Optional[int] = None
    act_s: Optional[str] = "relu"
    act_v: Optional[str] = "sigmoid"
    vector_gate: bool = True

    @nn.compact
    def __call__(self, x):
        si, vi = self.in_dims
        so, vo = self.out_dims
        # every Linear here is a raw torch.nn.Linear in the reference
        # (gvp_layer.py:128-135) -> torch default init
        ki, bi = torch_linear_kernel_init, torch_linear_bias_init
        if vi:
            s, v = x
            h_dim = self.h_dim or max(vi, vo)
            vt = jnp.swapaxes(v, -1, -2)                       # [..., 3, vi]
            vh = nn.Dense(h_dim, use_bias=False, kernel_init=ki,
                          name="wh")(vt)                       # [..., 3, h]
            vn = norm_no_nan(vh, axis=-2)                      # [..., h]
            s = nn.Dense(so, kernel_init=ki, bias_init=bi(h_dim + si),
                         name="ws")(jnp.concatenate([s, vn], -1))
            if vo:
                v = nn.Dense(vo, use_bias=False, kernel_init=ki,
                             name="wv")(vh)
                v = jnp.swapaxes(v, -1, -2)                    # [..., vo, 3]
                if self.vector_gate:
                    gate_in = ACT[self.act_v](s) if self.act_v else s
                    gate = nn.Dense(vo, kernel_init=ki, bias_init=bi(so),
                                    name="wsv")(gate_in)
                    v = v * nn.sigmoid(gate)[..., None]
                elif self.act_v:
                    v = v * ACT[self.act_v](norm_no_nan(v, axis=-1, keepdims=True))
        else:
            s = nn.Dense(so, kernel_init=ki, bias_init=bi(si),
                         name="ws")(x)
            if vo:
                v = jnp.zeros(s.shape[:-1] + (vo, 3), s.dtype)
        if self.act_s:
            s = ACT[self.act_s](s)
        return (s, v) if vo else s


class GVPLayerNorm(nn.Module):
    """Tuple layer norm: scalar LN + vector RMS over channels
    (gvp_layer.py:221-243)."""

    dims: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        s_dim, v_dim = self.dims
        if not v_dim:
            return nn.LayerNorm(epsilon=1e-5)(x)
        s, v = x
        vn = norm_no_nan(v, axis=-1, keepdims=True, sqrt=False)
        vn = jnp.sqrt(jnp.mean(vn, axis=-2, keepdims=True))
        return nn.LayerNorm(epsilon=1e-5)(s), v / vn


class GVPDropout(nn.Module):
    """Tuple dropout: iid on scalars, whole-vector-channel on vectors
    (gvp_layer.py:173-218)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        s, v = x
        s = nn.Dropout(rate=self.rate, deterministic=False)(s)
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1 - self.rate, v.shape[:-1])
        v = jnp.where(keep[..., None], v / (1 - self.rate), 0)
        return s, v
