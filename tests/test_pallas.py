"""Pallas kernels vs their XLA twins (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometric_message_passing_tpu.ops.pallas_edge import (
    egnn_message_xla,
    make_egnn_message_fused,
    segment_sum_pallas,
)
from geometric_message_passing_tpu.ops.scatter import segment_sum


def test_segment_sum_pallas_matches():
    rng = np.random.default_rng(0)
    e, d, n = 700, 64, 100  # non-multiple of block to exercise padding
    data = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    mask = jnp.asarray(rng.random(e) > 0.2)
    out = segment_sum_pallas(data, seg, n, mask=mask, block_edges=256,
                             interpret=True)
    ref = segment_sum(data, seg, n, mask=mask)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_egnn_fused_matches_xla_twin():
    rng = np.random.default_rng(1)
    n, e, d = 40, 150, 32
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    send = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    recv = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    emask = jnp.asarray(rng.random(e) > 0.1)
    p_rows = (2 * d + 1) + 3 + d + 3 + d + 3 + 2
    packed_w = jnp.asarray(
        (rng.normal(size=(p_rows, d)) * 0.1).astype(np.float32)
    )

    fused = make_egnn_message_fused(d, interpret=True)
    out_p = fused(send, recv, emask, h, pos, packed_w)
    out_x = egnn_message_xla(send, recv, emask, h, pos, packed_w, d)
    for a, b, name in zip(out_p, out_x, ("msg", "pos", "cnt")):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4), (
            name, np.abs(np.asarray(a) - np.asarray(b)).max()
        )


def test_egnn_fused_gradients():
    """custom_vjp backward (XLA twin) produces the same grads as
    differentiating the twin directly."""
    rng = np.random.default_rng(2)
    n, e, d = 20, 60, 16
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    send = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    recv = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    emask = jnp.asarray(np.ones(e, bool))
    p_rows = (2 * d + 1) + 3 + d + 3 + d + 3 + 2
    packed_w = jnp.asarray(
        (rng.normal(size=(p_rows, d)) * 0.1).astype(np.float32)
    )
    fused = make_egnn_message_fused(d, interpret=True)

    def loss_fused(h_, w_):
        m, p, c = fused(send, recv, emask, h_, pos, w_)
        return jnp.sum(m**2) + jnp.sum(p**2) + jnp.sum(c)

    def loss_twin(h_, w_):
        m, p, c = egnn_message_xla(send, recv, emask, h_, pos, w_, d)
        return jnp.sum(m**2) + jnp.sum(p**2) + jnp.sum(c)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(h, packed_w)
    g2 = jax.grad(loss_twin, argnums=(0, 1))(h, packed_w)
    for a, b in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_egnn_fused_pallas_backward_matches_twin_grads():
    """The fully fused Pallas backward kernel (in-VMEM recompute + manual
    backprop) produces the same (dh, dpos, dW) as autodiff of the XLA twin."""
    rng = np.random.default_rng(3)
    n, e, d = 24, 90, 16
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    send = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    recv = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    emask = jnp.asarray(rng.random(e) > 0.15)
    p_rows = (2 * d + 1) + 3 + d + 3 + d + 3 + 2
    packed_w = jnp.asarray(
        (rng.normal(size=(p_rows, d)) * 0.1).astype(np.float32)
    )
    fused = make_egnn_message_fused(d, interpret=True, pallas_bwd=True)

    gm = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    gp = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

    def loss_fused(h_, pos_, w_):
        m, p, c = fused(send, recv, emask, h_, pos_, w_)
        return jnp.sum(m * gm) + jnp.sum(p * gp) + jnp.sum(c)

    def loss_twin(h_, pos_, w_):
        m, p, c = egnn_message_xla(send, recv, emask, h_, pos_, w_, d)
        return jnp.sum(m * gm) + jnp.sum(p * gp) + jnp.sum(c)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(h, pos, packed_w)
    g2 = jax.grad(loss_twin, argnums=(0, 1, 2))(h, pos, packed_w)
    for a, b, name in zip(g1, g2, ("dh", "dpos", "dw")):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-3), (
            name, np.abs(np.asarray(a) - np.asarray(b)).max()
        )


def test_edge_weighted_contract_matches_xla():
    """TP stage-2 kernel (ops/pallas_tp.py): fwd and both grads match the
    einsum twin, including bf16 W (cotangent dtype preserved) and a ragged
    E that needs block padding."""
    from geometric_message_passing_tpu.ops.pallas_tp import (
        _contract_xla, edge_weighted_contract)

    rng = np.random.default_rng(0)
    for E, K, w, m, wdtype in [(70, 96, 16, 7, jnp.float32),
                               (64, 32, 8, 1, jnp.float32),
                               (33, 64, 16, 5, jnp.bfloat16)]:
        T = jnp.asarray(rng.standard_normal((E, K, m)), jnp.float32)
        W = jnp.asarray(rng.standard_normal((E, K, w)), wdtype)

        out_k = edge_weighted_contract(T, W, te=32, force="interpret")
        out_x = _contract_xla(T, W)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                                   atol=2e-5 if wdtype == jnp.float32
                                   else 3e-2)

        def loss_k(T, W):
            return jnp.sum(jnp.square(edge_weighted_contract(
                T, W, te=32, force="interpret")))

        def loss_x(T, W):
            return jnp.sum(jnp.square(_contract_xla(T, W)))

        gk = jax.grad(loss_k, argnums=(0, 1))(T, W)
        gx = jax.grad(loss_x, argnums=(0, 1))(T, W)
        assert gk[1].dtype == wdtype
        scale = max(float(jnp.abs(gx[0]).max()), 1.0)
        np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gx[0]),
                                   atol=(2e-5 if wdtype == jnp.float32
                                         else 3e-2) * scale)
        scale = max(float(jnp.abs(gx[1].astype(jnp.float32)).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(gk[1].astype(jnp.float32)),
            np.asarray(gx[1].astype(jnp.float32)),
            atol=(2e-5 if wdtype == jnp.float32 else 3e-2) * scale)
