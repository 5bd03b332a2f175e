"""Micro-trial: stage-2 layouts for the edge tensor product at TFN shapes.

The FCTP's stage 2 contracts the per-edge weight giant W [E, sum_p u*w]
(~94k floats/edge at 64 ch, max_ell 3) against the CG intermediate
tmp [E, u, M].  Variants:

  a) current: per-output-irrep einsum "...upm,...puw->...wm"
     (contraction over (u,p) split across non-adjacent axes -> XLA may
     relayout one operand; W is the 289MB tensor, tmp the 39MB one)
  b) layout-matched: build T in [E, (p,u), m] order so W reshapes FREELY to
     [E, (p,u), w] (its native flat layout) and the contraction is one
     batched matmul over the contiguous k=(p,u) axis per output irrep.
  c) variant (b) but W bf16 (model default).

Each timed as fwd and fwd+bwd inside a lax.scan (tunnel dispatch amortized).
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
from geometric_message_passing_tpu.nn.tensor_product import EdgeTensorProduct

ITERS = 50
E = 1536


def timed(name, fn, *args):
    @jax.jit
    def loop(seed, *a):
        def body(c, i):
            # perturb by seed+index: iteration- AND call-dependent, so the
            # body can neither be hoisted out of the loop nor the whole
            # call deduplicated against an earlier identical execution
            eps = (seed + i.astype(jnp.float32)) * 1e-30
            a0 = jax.tree.map(
                lambda x: x + eps.astype(x.dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                a[0])
            out = fn(a0, *a[1:])
            # sum-of-SQUARES: a plain sum lets XLA factor the reduction
            # through the matmul (sum_w W first) and skip the contraction
            s = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                    for x in jax.tree.leaves(out))
            return c + s * 1e-30, None

        tot, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                              jnp.arange(ITERS))
        return tot

    float(loop(jnp.float32(0.0), *args))   # warmup; fetch forces completion
    times = []
    for k in range(3):
        t0 = time.perf_counter()
        # NOTE: jax.block_until_ready does NOT reliably block on the axon
        # tunnel backend — only a host fetch of the value does (CLAUDE.md)
        float(loop(jnp.float32(k + 1.0), *args))
        times.append((time.perf_counter() - t0) / ITERS * 1000)
    ms = sorted(times)[1]
    print(f"{name:44s} {ms:8.2f} ms/iter   (3 reps: "
          + ", ".join(f"{t:.2f}" for t in times) + ")", flush=True)
    return ms


def main():
    sh_irreps = Irreps.spherical_harmonics(3)
    hidden = (sh_irreps * 64).sort().simplify()
    tp = EdgeTensorProduct(hidden, sh_irreps, hidden)
    u = tp._uniform_mul
    M = tp._C.shape[-1]
    rng = np.random.default_rng(0)
    tmp = jnp.asarray(rng.standard_normal((E, u, M)), jnp.float32)
    w_f32 = jnp.asarray(
        rng.standard_normal((E, tp.weight_numel)), jnp.float32)
    w_bf16 = w_f32.astype(jnp.bfloat16)
    print(f"E={E} u={u} M={M} weight_numel={tp.weight_numel} "
          f"paths={len(tp.paths)} groups={len(tp._groups)}")

    def stage2_current(tmp, weights):
        outs = []
        for i_out, n_p, m0, w0, d3, _, mul_o in tp._groups:
            T = tmp[..., m0:m0 + n_p * d3].reshape(
                tmp.shape[:-1] + (n_p, d3))
            nW = n_p * u * mul_o
            W = weights[..., w0:w0 + nW].reshape(
                weights.shape[:-1] + (n_p, u, mul_o))
            outs.append(jnp.einsum("...upm,...puw->...wm", T, W))
        return outs

    def stage2_matched(tmp, weights):
        outs = []
        for i_out, n_p, m0, w0, d3, _, mul_o in tp._groups:
            # T -> [E, (p,u), m] so W's native flat layout [E, (p,u), w]
            # needs no relayout; one batched matmul over contiguous k.
            T = tmp[..., m0:m0 + n_p * d3].reshape(
                tmp.shape[:-1] + (n_p, d3))        # [E,u,P,m]
            T = jnp.swapaxes(T, -3, -2).reshape(
                tmp.shape[:-2] + (n_p * u, d3))    # [E,(p,u),m]
            nW = n_p * u * mul_o
            W = weights[..., w0:w0 + nW].reshape(
                weights.shape[:-1] + (n_p * u, mul_o))  # [E,(p,u),w] FREE
            outs.append(jnp.einsum("...km,...kw->...wm", T, W))
        return outs

    for name, fn, w in [
        ("a) current f32", stage2_current, w_f32),
        ("a) current bf16 W", stage2_current, w_bf16),
        ("b) layout-matched f32", stage2_matched, w_f32),
        ("c) layout-matched bf16 W", stage2_matched, w_bf16),
    ]:
        timed(f"{name} fwd", fn, tmp, w)
        timed(f"{name} fwd+bwd",
              lambda t_, w_, fn=fn: jax.grad(
                  lambda a, b: sum(jnp.sum(jnp.square(o.astype(jnp.float32)))
                                   for o in fn(a, b)), argnums=(0, 1)
              )(t_, w_), tmp, w)

    # numerics check
    o1 = stage2_current(tmp, w_f32)
    o2 = stage2_matched(tmp, w_f32)
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(o1, o2))
    print(f"max |a-b| = {err:.2e}")





def pallas_vs_einsum():
    """Time ops/pallas_tp.py::edge_weighted_contract against the einsum twin
    at the real TFN group shapes (per conv layer, f32)."""
    from geometric_message_passing_tpu.ops.pallas_tp import (
        _contract_xla, edge_weighted_contract)

    sh_irreps = Irreps.spherical_harmonics(3)
    hidden = (sh_irreps * 64).sort().simplify()
    tp = EdgeTensorProduct(hidden, sh_irreps, hidden)
    u = tp._uniform_mul
    rng = np.random.default_rng(0)
    shapes = [(n_p * u, d3, mul_o)
              for _, n_p, _, _, d3, _, mul_o in tp._groups]
    print("group shapes (K, m, w):", shapes)

    for te in (32, 64):
        for name, fn in [
            ("einsum", lambda T, W: _contract_xla(T, W)),
            (f"pallas te={te}",
             lambda T, W, te=te: edge_weighted_contract(T, W, te=te)),
        ]:
            def all_groups(Ts, Ws=None):
                # Ts carries both when grads not needed
                return [fn(t, w) for t, w in zip(Ts[0], Ts[1])]

            Ts = tuple(jnp.asarray(rng.standard_normal((E, K, m)),
                                   jnp.float32) for K, m, _ in shapes)
            Ws = tuple(jnp.asarray(rng.standard_normal((E, K, w)),
                                   jnp.float32) for K, _, w in shapes)
            timed(f"{name} all-groups fwd", all_groups, (Ts, Ws))
            timed(f"{name} all-groups fwd+bwd",
                  lambda TW: jax.grad(
                      lambda ts, ws: sum(
                          jnp.sum(jnp.square(fn(t, w)))
                          for t, w in zip(ts, ws)),
                      argnums=(0, 1))(TW[0], TW[1]),
                  (Ts, Ws))


if __name__ == "__main__" and "pallas" in sys.argv:
    pallas_vs_einsum()
    sys.exit(0)


if __name__ == "__main__":
    if "pallas" not in sys.argv:
        main()
