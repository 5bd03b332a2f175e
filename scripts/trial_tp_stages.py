"""Attribute the TFN conv layer's step time to its stages, on the real TPU.

The conv (nn/conv.py::TensorProductConvLayer at the TFN heavy-layer shapes,
gate=True) decomposes into: fc trunk -> per-group weight heads -> TP stage 1
(combined-CG einsum) -> TP stage 2 (per-group batched GEMMs) -> segment_sum
-> gate.  This times each piece (fwd and fwd+bwd) in a fetched lax.scan loop
(timer traps per CLAUDE.md), plus stage-1 formulation variants, to decide
where the remaining TFN milliseconds live.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geometric_message_passing_tpu.irreps import Irreps
from geometric_message_passing_tpu.nn.basic import MLP
from geometric_message_passing_tpu.nn.equivariant import (Gate, irreps2gate,
                                                          merge_blocks)
from geometric_message_passing_tpu.nn.tensor_product import (
    EdgeTensorProduct, _to_channel_layout)
from geometric_message_passing_tpu.ops.scatter import segment_sum

ITERS = 50
E, N, H = 1408, 808, 256


def timed(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, i):
            eps = i.astype(jnp.float32) * 1e-30
            a0 = jax.tree.map(
                lambda x: x + eps.astype(x.dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                a[0],
            )
            out = fn(a0, *a[1:])
            s = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                    for x in jax.tree.leaves(out)
                    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating))
            return c + s * 1e-30, None

        tot, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                              jnp.arange(ITERS))
        return tot

    float(loop(*args))
    float(loop(*args))  # two warmups: first execution pays tunnel upload
    t0 = time.perf_counter()
    float(loop(*args))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:42s} {ms:8.3f} ms/iter", flush=True)
    return ms


def grad_of(fn, argnums=0):
    def f(*args):
        return jax.grad(
            lambda *a: sum(jnp.sum(jnp.square(x))
                           for x in jax.tree.leaves(fn(*a))), argnums=argnums
        )(*args)
    return f


def main():
    rng = np.random.default_rng(0)
    sh_irreps = Irreps.spherical_harmonics(3)
    hidden = (sh_irreps * 64).sort().simplify()
    scalars, gates, gated = irreps2gate(hidden)
    gate = Gate(scalars, gates, gated)
    tp_out = gate.irreps_in
    tp = EdgeTensorProduct(hidden, sh_irreps, tp_out)
    print(f"hidden={hidden} tp_out={tp_out} weight_numel={tp.weight_numel}")

    x = jnp.asarray(rng.standard_normal((E, hidden.dim)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((E, sh_irreps.dim)), jnp.float32)
    ef = jnp.asarray(rng.standard_normal((E, 8)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((E, H)), jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((E, n)), jnp.float32)
          for n in tp.group_weight_numels]
    senders = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    msg = jnp.asarray(rng.standard_normal((E, tp_out.dim)), jnp.float32)
    u = tp._uniform_mul
    C = jnp.asarray(tp._C)                     # [L, S, M]
    L, S, M = C.shape
    xr = _to_channel_layout(x, hidden)         # [E, u, L]

    # --- fc trunk + heads ---
    trunk = MLP(hidden=(H,), activation="relu", norm=None, act_final=True)
    tv = trunk.init(jax.random.PRNGKey(0), ef)
    timed("fc trunk fwd", lambda e: trunk.apply(tv, e), ef)
    import flax.linen as fnn

    class Heads(fnn.Module):
        @fnn.compact
        def __call__(self, a):
            return [fnn.Dense(n)(a) for n in tp.group_weight_numels]

    heads = Heads()
    hv = heads.init(jax.random.PRNGKey(1), a)
    timed("heads fwd", lambda q: heads.apply(hv, q), a)
    timed("heads fwd+bwd(a,params)",
          grad_of(lambda q, p: heads.apply(p, q), (0, 1)), a, hv)

    # --- stage 1 variants ---
    def s1_current(xr_, sh_):
        return jnp.einsum("eua,eb,abm->eum", xr_, sh_, C)

    def s1_csh(xr_, sh_):
        csh = jnp.einsum("eb,abm->eam", sh_, C)
        return jnp.einsum("eua,eam->eum", xr_, csh)

    def s1_xsh(xr_, sh_):
        xsh = (xr_[:, :, :, None] * sh_[:, None, None, :]).reshape(E, u, L * S)
        return xsh @ C.reshape(L * S, M)

    timed("stage1 current fwd", s1_current, xr, sh)
    timed("stage1 current fwd+bwd", grad_of(s1_current, (0, 1)), xr, sh)
    timed("stage1 Csh-first fwd", s1_csh, xr, sh)
    timed("stage1 Csh-first fwd+bwd", grad_of(s1_csh, (0, 1)), xr, sh)
    timed("stage1 xsh-GEMM fwd", s1_xsh, xr, sh)
    timed("stage1 xsh-GEMM fwd+bwd", grad_of(s1_xsh, (0, 1)), xr, sh)

    # --- stage 2 only (T given) ---
    tmp = np.asarray(rng.standard_normal((E, u, M)), np.float32)
    tmpj = jnp.asarray(tmp)

    def s2(tmp_, ws_):
        outs = [None] * len(tp.irreps_out)
        for g, (i_out, n_p, m0, w0, d3, _, mul_o) in enumerate(tp._groups):
            T = tmp_[..., m0 : m0 + n_p * d3].reshape(E, u, n_p, d3)
            T = jnp.swapaxes(T, -3, -2).reshape(E, n_p * u, d3)
            W = ws_[g].reshape(E, n_p * u, mul_o)
            outs[i_out] = jnp.einsum("...km,...kw->...wm", T, W)
        for k, (mul, ir) in enumerate(tp.irreps_out):
            if outs[k] is None:
                outs[k] = jnp.zeros((E, mul, ir.dim), jnp.float32)
        return merge_blocks(outs)

    timed("stage2 fwd", s2, tmpj, ws)
    timed("stage2 fwd+bwd", grad_of(s2, (0, 1)), tmpj, ws)

    # --- full TP ---
    timed("TP full fwd", tp.apply_grouped, x, sh, ws)
    timed("TP full fwd+bwd",
          grad_of(lambda x_, sh_, ws_: tp.apply_grouped(x_, sh_, ws_),
                  (0, 1, 2)), x, sh, ws)

    # --- scatter + gate ---
    timed("segment_sum fwd+bwd",
          grad_of(lambda m: segment_sum(m, senders, N)), msg)
    gv = gate.init(jax.random.PRNGKey(2), msg)
    timed("gate fwd+bwd", grad_of(lambda m: gate.apply(gv, m)), msg)


if __name__ == "__main__":
    main()
