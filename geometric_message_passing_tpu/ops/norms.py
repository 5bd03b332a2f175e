"""Gradient-safe vector norms.

``jnp.linalg.norm`` has a NaN gradient at 0 (d sqrt(u)/du -> inf, chained with
du/dx -> 0 gives inf*0 = NaN).  Padded batches contain exactly-zero edge
vectors (pad edges self-loop on the pad node), and masking *after* the norm
does not fix the backward pass — 0 * NaN is still NaN.  The double-where
pattern below yields value 0 and gradient 0 at the origin.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x, axis=-1, keepdims: bool = False, eps: float = 1e-24):
    """L2 norm with value 0 and zero gradient at x = 0."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    positive = sq > eps
    safe = jnp.where(positive, sq, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def safe_normalize(x, axis=-1, eps: float = 1e-24):
    """x / ||x|| with zero output (and zero gradient) at x = 0."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    positive = sq > eps
    inv = jnp.where(positive, 1.0 / jnp.sqrt(jnp.where(positive, sq, 1.0)), 0.0)
    return x * inv


def safe_arctan2(y, x, eps: float = 1e-12):
    """arctan2 with finite gradients at (0, 0).

    d(arctan2)/dx = -y/(x^2+y^2) and /dy = x/(x^2+y^2) are NaN at the
    origin; pad triplets/quads hit it exactly (all positions collapse onto
    the pad node).  Degenerate entries get x pinned to 1 before the call
    (value arctan2(0,1)=0, gradients 0 and bounded); masking AFTER arctan2
    does not fix the backward pass.
    """
    degen = (jnp.abs(x) < eps) & (jnp.abs(y) < eps)
    return jnp.arctan2(y, jnp.where(degen, 1.0, x))
