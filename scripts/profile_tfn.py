"""Attribute TFN per-step time to components, on the real TPU.

Each candidate is wrapped in a lax.scan of ITERS iterations inside one jit
program (per CLAUDE.md: single jitted calls measure ~0.9ms tunnel dispatch,
not kernel time). Prints ms/iteration per component and the full
train-step time for reference.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.experiments.train import (
    init_variables, l1_sum_loss, seed_everything, tiny_init_batch)
from geometric_message_passing_tpu.graph import (GraphLoader, batch_graphs,
                                                 pad_sizes, random_split)
from geometric_message_passing_tpu.irreps import Irreps
from geometric_message_passing_tpu.models import TFNModel
from geometric_message_passing_tpu.ops.scatter import segment_sum
from geometric_message_passing_tpu.ops.spherical import spherical_harmonics

ITERS = int(os.environ.get("GMP_PROFILE_ITERS", "50"))


def timed(name, fn, *args):
    """fn must be a scan-body-compatible pure fn of args; returns ms/iter."""

    @jax.jit
    def loop(*a):
        def body(c, i):
            # perturb the first arg by the scan index: iteration-dependent,
            # so the body cannot be hoisted out of the loop (c*0 would be
            # constant-folded and LICM'd)
            eps = i.astype(jnp.float32) * 1e-30
            a0 = jax.tree.map(
                lambda x: x + eps.astype(x.dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                a[0],
            )
            out = fn(a0, *a[1:])
            # sum of SQUARES: a plain sum lets XLA factor the reduction
            # through matmuls and skip the contraction entirely
            s = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                    for x in jax.tree.leaves(out)
                    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating))
            return c + s * 1e-30, None

        tot, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                              jnp.arange(ITERS))
        return tot

    float(loop(*args))   # warmup; host fetch forces completion (the axon
    # tunnel's block_until_ready does NOT reliably block — CLAUDE.md)
    t0 = time.perf_counter()
    float(loop(*args))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:36s} {ms:8.2f} ms/iter", flush=True)
    return ms


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "tfn"
    data = ds.create_star_graphs(num=1500, fold=[7], dim=3, target="max",
                                 seed=0)
    tr, _, _ = random_split(data, [0.5, 0.2, 0.3], seed=0)
    pad = pad_sizes(data, 100)
    gb = batch_graphs(tr[:100], *pad)
    from geometric_message_passing_tpu.models import MACEModel

    model = dict(
        tfn=TFNModel(out_dim=1, emb_dim=64, num_layers=4, max_ell=3,
                     pool="first"),
        mace=MACEModel(out_dim=1, emb_dim=64, num_layers=2, max_ell=3,
                       correlation=3, pool="first"),
    )[name]
    tr_l = GraphLoader(tr, batch_size=100, pad=pad)
    variables = init_variables(model, seed_everything(0),
                               tiny_init_batch(tr_l))
    params = variables["params"]
    uv = {k: v for k, v in variables.items() if k != "params"}
    gb = jax.device_put(gb)

    # full fwd / fwd+bwd
    def fwd(p):
        return model.apply({"params": p, **uv}, gb)

    def fwdbwd(p):
        return jax.grad(lambda q: l1_sum_loss(
            model.apply({"params": q, **uv}, gb), gb))(p)

    t_f = timed("model fwd", fwd, params)
    t_fb = timed("model fwd+bwd", fwdbwd, params)

    # components at real shapes
    E = gb.senders.shape[0]
    N = gb.pos.shape[0]
    sh_irreps = Irreps.spherical_harmonics(3)
    hidden = (sh_irreps * 64).sort().simplify()
    from geometric_message_passing_tpu.nn.tensor_product import (
        EdgeTensorProduct)

    tp = EdgeTensorProduct(hidden, sh_irreps, hidden)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((E, hidden.dim)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((E, sh_irreps.dim)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((E, tp.weight_numel)), jnp.float32)
    ef = jnp.asarray(rng.standard_normal((E, 8)), jnp.float32)
    msg = jnp.asarray(rng.standard_normal((E, hidden.dim)), jnp.float32)

    timed("edge TP fwd", tp.apply, x, sh, w)
    timed("edge TP fwd+bwd",
          lambda x_, sh_, w_: jax.grad(
              lambda a, b, c: jnp.sum(tp.apply(a, b, c)), argnums=(0, 2)
          )(x_, sh_, w_), x, sh, w)
    timed("segment_sum E->N (msg width)",
          lambda m: segment_sum(m, gb.senders, N, mask=gb.edge_mask), msg)
    vecs = gb.pos[gb.receivers] - gb.pos[gb.senders]
    timed("spherical harmonics l<=3",
          lambda v: spherical_harmonics(v, 3), vecs)
    print(f"\nfull step breakdown target: fwd {t_f:.1f} fwd+bwd {t_fb:.1f}")


if __name__ == "__main__":
    main()
