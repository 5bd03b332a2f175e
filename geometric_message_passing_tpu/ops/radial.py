"""Radial basis expansions and cutoff envelopes — pure jnp, fused by XLA into
the surrounding edge computation.

Numerics mirror:
  * BesselBasis            /root/reference/models/mace_modules/radial.py:12-46
  * PolynomialCutoff       /root/reference/models/mace_modules/radial.py:55-78
  * GaussianSmearing       PyG SchNet internals (used via schnet.py:68)
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def bessel_basis(r, r_max: float, num_basis: int = 8, eps: float = 1e-12):
    """sqrt(2/r_max) * sin(n*pi*r/r_max) / r, n = 1..num_basis.

    ``r``: [..., 1] edge lengths. Returns [..., num_basis].
    Safe at r=0 for padded edges (returns the finite limit direction-free
    value via eps-guarded division; pad edges are masked downstream anyway).
    """
    n = jnp.asarray(np.pi / r_max * np.arange(1, num_basis + 1), dtype=r.dtype)
    prefactor = math.sqrt(2.0 / r_max)
    r_safe = jnp.where(r > eps, r, eps)
    return prefactor * jnp.sin(n * r_safe) / r_safe


def polynomial_cutoff(r, r_max: float, p: int = 6):
    """DimeNet eq. (8) smooth envelope, zero past r_max (radial.py:71-78)."""
    x = r / r_max
    envelope = (
        1.0
        - ((p + 1.0) * (p + 2.0) / 2.0) * x**p
        + p * (p + 2.0) * x ** (p + 1)
        - (p * (p + 1.0) / 2.0) * x ** (p + 2)
    )
    return envelope * (r < r_max)


def radial_embedding(lengths, r_max: float, num_bessel: int = 8,
                     num_polynomial_cutoff: int = 5):
    """Bessel x cutoff, the shared edge featurization of TFN/MACE/GVP
    (blocks.py:84-96; used at mace.py:174, tfn.py:175, gvpgnn.py:111)."""
    return bessel_basis(lengths, r_max, num_bessel) * polynomial_cutoff(
        lengths, r_max, num_polynomial_cutoff
    )


def gaussian_smearing(r, start: float = 0.0, stop: float = 10.0,
                      num_gaussians: int = 50):
    """exp(-gamma (r - mu_k)^2) on an even grid — PyG ``GaussianSmearing``
    numerics (SchNet distance expansion)."""
    offset = jnp.asarray(np.linspace(start, stop, num_gaussians), dtype=r.dtype)
    coeff = -0.5 / float(np.diff(np.linspace(start, stop, num_gaussians))[0]) ** 2
    diff = r[..., None] - offset if r.ndim == 1 else r - offset
    return jnp.exp(coeff * diff**2)
