"""Layout experiment for the at-scale uvu TP (round-5 item 1).

profile_box.py attribution: the uvu TP is ~84% of the interaction block's
fwd+bwd at box scale, and the XLA memory dump shows its per-path
intermediates laid out with tiny (d3<=7) tile dims (1.6-41x padding
expansion).  Candidate: run the TP in a u-MINOR layout ([E, d, u] blocks,
u=64 on the 128-lane axis) so every per-path matmul tile is half-full
instead of ~5%-full.

Times one 8192-edge chunk schedule (x16) per variant, fwd and
remat-style fwd+bwd (jax.checkpoint around the TP like the model's
nn.remat), fetched-result protocol per CLAUDE.md.

Usage: python scripts/trial_tp_uminor.py [mace|tfn]
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
from geometric_message_passing_tpu.irreps import Irreps
from geometric_message_passing_tpu.nn.tensor_product import (
    EdgeTensorProductUVU)
from geometric_message_passing_tpu.irreps import wigner_3j


def uminor_apply(tp, xt, sh, weights):
    """Per-path uvu TP in u-minor layout: xt is the TRANSPOSED channel
    layout [E, L, u] (L = sum d1 over input irreps); returns [E, M, u]
    (M = sum d3 over paths, slot order)."""
    a_offs = []
    ix = 0
    for _, ir in tp.irreps_in:
        a_offs.append(ix)
        ix += ir.dim
    outs = []
    w_off = 0
    for p in tp.paths:
        a0 = a_offs[p.i_in1]
        xin = xt[..., a0 : a0 + p.ir_in1.dim, :]      # [E, d1, u]
        off, d2 = tp._sh_offsets[p.i_in2]
        sh_blk = sh[..., off : off + d2]
        C = jnp.asarray(
            wigner_3j(p.ir_in1.l, p.ir_in2.l, p.ir_out.l), xt.dtype)
        W = weights[..., w_off : w_off + p.mul_in1]   # [E, u]
        w_off += p.mul_in1
        y = p.path_weight * jnp.einsum(
            "...au,...b,abm,...u->...mu", xin, sh_blk, C, W,
            precision=tp.precision)
        outs.append(y)                                 # [E, d3, u]
    return jnp.concatenate(outs, axis=-2)              # [E, M, u]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "mace"
    max_ell = 3 if which == "mace" else 2
    prec = "highest" if which == "mace" else None
    emb = 64
    sh_irreps = Irreps.spherical_harmonics(max_ell)
    hidden = (sh_irreps * emb).sort().simplify()
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)

    n_chunks, C = 16, 8192
    for p in (prec, None) if prec else (None,):
        tp = EdgeTensorProductUVU(hidden, sh_irreps, hidden, precision=p)
        L = sum(ir.dim for _, ir in tp.irreps_in)
        xs = (f32(n_chunks, C, hidden.dim), f32(n_chunks, C, sh_irreps.dim),
              f32(n_chunks, C, tp.weight_numel))

        def loop(fn):
            def run(xs):
                def body(c, z):
                    y = jax.checkpoint(fn)(*z)
                    return c + jnp.sum(jnp.square(y)), None
                tot, _ = jax.lax.scan(body, 0.0, xs)
                return tot
            return run

        def grad_loop(fn):
            run = loop(fn)
            def g(xs):
                return jax.grad(lambda xs: run(xs))(xs)
            return g

        u = tp._uniform_mul

        def per_path(x, s, w):
            return tp._apply_per_path(x, s, w)

        def uminor(x, s, w):
            # [E, flat] -> [E, u, L] -> [E, L, u]
            from geometric_message_passing_tpu.nn.tensor_product import (
                _to_channel_layout)
            xr = _to_channel_layout(x, tp.irreps_in)
            xt = jnp.swapaxes(xr, -1, -2)
            y = uminor_apply(tp, xt, s, w)             # [E, M, u]
            return jnp.swapaxes(y, -1, -2)             # [E, u, M]

        def uminor_stay(x, s, w):
            # no transpose back (the fold-linear consumer can stay u-minor)
            from geometric_message_passing_tpu.nn.tensor_product import (
                _to_channel_layout)
            xr = _to_channel_layout(x, tp.irreps_in)
            xt = jnp.swapaxes(xr, -1, -2)
            return uminor_apply(tp, xt, s, w)

        def combined(x, s, w):
            return tp._apply_combined(x, s, w)

        # Broadcast-multiply-reduce forms: the contraction axes (d1<=7 /
        # L=16) are far below the MXU tile, so per-edge batched dots run at
        # ~100-350 GFLOP/s; forcing an elementwise broadcast + small-axis
        # reduce lowers to fused VPU code at bandwidth speed — and is EXACT
        # f32 (no MXU bf16 passes), so 'highest' comes free.
        from geometric_message_passing_tpu.nn.tensor_product import (
            _to_channel_layout)

        def bcast_path(x, s, w):
            a_offs = []
            ix = 0
            for _, ir in tp.irreps_in:
                a_offs.append(ix)
                ix += ir.dim
            xr = _to_channel_layout(x, tp.irreps_in)     # [E, u, L]
            outs = []
            w_off = 0
            for pth in tp.paths:
                a0 = a_offs[pth.i_in1]
                xin = xr[..., a0 : a0 + pth.ir_in1.dim]  # [E, u, d1]
                off, d2 = tp._sh_offsets[pth.i_in2]
                sh_blk = s[..., off : off + d2]
                Cw = jnp.asarray(
                    wigner_3j(pth.ir_in1.l, pth.ir_in2.l, pth.ir_out.l),
                    x.dtype)
                K = jnp.einsum("...b,abm->...am", sh_blk, Cw)  # [E,d1,d3]
                W = w[..., w_off : w_off + pth.mul_in1]        # [E, u]
                w_off += pth.mul_in1
                y = (xin[..., :, :, None] * K[..., None, :, :]).sum(-2)
                outs.append(pth.path_weight * y * W[..., None])
            return jnp.concatenate(outs, axis=-1)

        Cd = jnp.asarray(tp._C, jnp.float32)             # [L, S, M]
        d3 = tp._d3

        def bcast_dense(x, s, w):
            xr = _to_channel_layout(x, tp.irreps_in)     # [E, u, L]
            K = jnp.einsum("...b,abm->...am", s, Cd)     # [E, L, M]
            y = (xr[..., :, :, None] * K[..., None, :, :]).sum(-2)
            P = len(tp.paths)
            W = w.reshape(w.shape[:-1] + (P, u))
            Wr = jnp.repeat(jnp.swapaxes(W, -1, -2), d3, axis=-1,
                            total_repeat_length=int(d3.sum()))
            return y * Wr

        sel = os.environ.get(
            "GMP_TP_VARIANTS",
            "per_path,bcast_path,bcast_dense,uminor,uminor_stay,combined"
        ).split(",")
        for name, fn in [("per_path", per_path),
                         ("bcast_path", bcast_path),
                         ("bcast_dense", bcast_dense),
                         ("uminor", uminor),
                         ("uminor_stay", uminor_stay),
                         ("combined", combined)]:
            if name not in sel:
                continue
            tag = f"[{name},{p or 'fast'}]"
            timed(f"{tag} fwd", loop(fn), xs)
            timed(f"{tag} fwd+bwd(remat)", grad_loop(fn), xs)


if __name__ == "__main__":
    main()
