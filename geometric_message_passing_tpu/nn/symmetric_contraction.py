"""MACE symmetric contraction (higher body-order product basis, MACE eqs 10-11).

Replaces /root/reference/models/mace_modules/symmetric_contraction.py:21-188.
The generalized-CG U tensors are trace-time constants (numpy, from
irreps.u_matrix_real); the descending-correlation chain of contractions maps
to ``jnp.einsum`` — XLA fuses the chain and runs the feature contractions on
the MXU.

Only the ``element_dependent=False`` path is exercised by the reference model
zoo (mace.py:119); the element-dependent variant (one-hot ``y``) is provided
for parity with the reference module.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..irreps import Irrep, Irreps, u_matrix_real


class Contraction(nn.Module):
    """Contraction to a single output irrep over all correlation orders."""

    irreps_in: Irreps          # coupling irreps (mult-1 view of node feats)
    ir_out: Irrep
    correlation: int
    num_features: int          # channel count (uniform multiplicity)
    element_dependent: bool = False
    num_elements: Optional[int] = None

    @nn.compact
    def __call__(self, x, y=None):
        """x: [n, channels, irreps_in.dim]; y: optional one-hot [n, elements].
        Returns [n, channels * ir_out.dim]."""
        # U tensors live in the non-trainable "u_tables" collection rather
        # than as jit constants: at max_ell=3/correlation=3 they total ~16MB
        # per layer and inlining them as HLO literals blew program text to
        # ~60MB — minutes of (remote) compile time.  As runtime arrays they
        # are transferred to HBM once and the program stays small.
        U = {}
        for nu in range(1, self.correlation + 1):
            var = self.variable(
                "u_tables", f"u{nu}",
                lambda nu=nu: jnp.asarray(
                    u_matrix_real(self.irreps_in, self.ir_out, nu),
                    dtype=jnp.float32,
                ),
            )
            U[nu] = var.value.astype(x.dtype)
        W = {}
        for nu in range(1, self.correlation + 1):
            num_params = U[nu].shape[-1]
            if self.element_dependent:
                shape = (self.num_elements, num_params, self.num_features)
            else:
                shape = (num_params, self.num_features)
            # reference init: randn / num_params (symmetric_contraction.py:125-127)
            W[nu] = self.param(
                f"w{nu}", nn.initializers.normal(stddev=1.0 / num_params), shape
            )

        nu = self.correlation
        if self.element_dependent:
            out = jnp.einsum("...ik,ekc,bci,be->bc...", U[nu], W[nu], x, y)
            for nu in range(self.correlation - 1, 0, -1):
                c = jnp.einsum("...k,ekc,be->bc...", U[nu], W[nu], y) + out
                out = jnp.einsum("bc...i,bci->bc...", c, x)
        else:
            out = jnp.einsum("...ik,kc,bci->bc...", U[nu], W[nu], x)
            for nu in range(self.correlation - 1, 0, -1):
                c = jnp.einsum("...k,kc->c...", U[nu], W[nu]) + out
                out = jnp.einsum("bc...i,bci->bc...", c, x)
        return out.reshape(out.shape[0], -1)


class SymmetricContraction(nn.Module):
    """One Contraction per output irrep, concatenated (symmetric_contraction.py:69-85)."""

    irreps_in: Irreps          # node feature irreps (uniform multiplicity)
    irreps_out: Irreps
    correlation: int
    element_dependent: bool = False
    num_elements: Optional[int] = None

    @nn.compact
    def __call__(self, x, y=None):
        """x: [n, channels, sum_l d_l] (reshape_irreps layout)."""
        muls = {mul for mul, _ in self.irreps_in}
        assert len(muls) == 1
        num_features = muls.pop()
        coupling = Irreps([(1, ir) for _, ir in self.irreps_in])
        outs = []
        for mul, ir in self.irreps_out:
            outs.append(
                Contraction(
                    irreps_in=coupling,
                    ir_out=ir,
                    correlation=self.correlation,
                    num_features=num_features,
                    element_dependent=self.element_dependent,
                    num_elements=self.num_elements,
                    name=f"contraction_{ir}",
                )(x, y)
            )
        return jnp.concatenate(outs, axis=-1)
