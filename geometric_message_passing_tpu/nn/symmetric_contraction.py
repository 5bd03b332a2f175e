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
    """All output irreps contracted in ONE fused einsum chain.

    The reference runs one ``Contraction`` per output irrep
    (symmetric_contraction.py:69-85) — 6 einsums per irrep per layer.  Here
    the per-irrep U tensors are stacked BLOCK-DIAGONALLY over
    (output_dim, n_paths): U_all[o, i1..inu, k] with each irrep's block at
    its (o, k) offsets and zeros elsewhere, so a single descending-nu chain
    produces every output irrep at once (the zero blocks annihilate cross
    terms — numerics are exactly the per-irrep results).  Cuts the
    per-layer dot_general count 4x at max_ell=3 and keeps the aggregate
    intermediate [n, c, D, d, d] the same size as the per-irrep sum.
    Per-irrep weight PARAMS are kept separate (same shapes/init as the
    reference) and concatenated at trace time.
    """

    irreps_in: Irreps          # node feature irreps (uniform multiplicity)
    irreps_out: Irreps
    correlation: int
    element_dependent: bool = False
    num_elements: Optional[int] = None
    # computation dtype of the contraction chain. The descending-nu chain
    # materializes [n, c, D, d, d] — the MACE layer's HBM giant — and
    # "bfloat16" halves that traffic (measured 1.25x faster MACE training,
    # 71s -> 55s/run at the star headline config). But the rounding between
    # chain stages costs training quality: star MAE degrades 0.0767 -> 0.0848
    # (reference 0.0766), so full f32 stays the default and bf16 is an
    # explicit speed/accuracy knob.
    chain_dtype: Optional[str] = None
    # jax matmul precision for the chain einsums ('highest' = exact-f32
    # MXU passes).  The TPU default rounds each einsum operand to ONE bf16
    # pass; the x^3 contraction chain compounds that rounding (round-3
    # precision ablation, RESULTS.md), so MACE runs this at 'highest'.
    chain_precision: str | None = None
    # Evaluate the chain in the reassociated outer-product form (see
    # _fused_chain): same parameters, same math, but the [n, c, D, d, d]
    # HBM giant never exists — the largest intermediate is x⊗x at
    # [n, c, d, d].  Applies to element_dependent=False, correlation<=3
    # (the zoo's entire usage); False forces the descending-nu reference
    # chain (kept for correlation>=4 and as the test twin).
    fused_lowrank: bool = True

    @nn.compact
    def __call__(self, x, y=None):
        """x: [n, channels, sum_l d_l] (reshape_irreps layout)."""
        muls = {mul for mul, _ in self.irreps_in}
        assert len(muls) == 1
        num_features = muls.pop()
        coupling = Irreps([(1, ir) for _, ir in self.irreps_in])
        irs_out = [ir for _, ir in self.irreps_out]
        D = sum(ir.dim for ir in irs_out)

        def stacked_u(nu):
            blocks = []
            for ir in irs_out:
                u = np.asarray(
                    u_matrix_real(coupling, ir, nu), dtype=np.float32
                )
                if u.ndim == nu + 1:     # scalar output: d_out axis omitted
                    u = u[None]
                blocks.append(u)
            K = sum(b.shape[-1] for b in blocks)
            d = blocks[0].shape[1]
            out = np.zeros((D,) + (d,) * nu + (K,), dtype=np.float32)
            o = k = 0
            for b in blocks:
                out[o : o + b.shape[0], ..., k : k + b.shape[-1]] = b
                o += b.shape[0]
                k += b.shape[-1]
            return out

        U, W = {}, {}
        for nu in range(1, self.correlation + 1):
            var = self.variable(
                "u_tables", f"u{nu}",
                lambda nu=nu: jnp.asarray(stacked_u(nu)),
            )
            U[nu] = var.value.astype(x.dtype)
            # per-irrep params, reference shapes/init; concat along k
            ws = []
            for ir in irs_out:
                u = u_matrix_real(coupling, ir, nu)
                k_i = u.shape[-1]
                if self.element_dependent:
                    shape = (self.num_elements, k_i, num_features)
                else:
                    shape = (k_i, num_features)
                ws.append(self.param(
                    f"contraction_{ir}_w{nu}",
                    nn.initializers.normal(stddev=1.0 / k_i), shape,
                ))
            W[nu] = jnp.concatenate(ws, axis=-2)

        in_dtype = x.dtype
        if self.chain_dtype is not None:
            cd = jnp.dtype(self.chain_dtype)
            x = x.astype(cd)
            U = {k: v.astype(cd) for k, v in U.items()}
            W = {k: v.astype(cd) for k, v in W.items()}
            if y is not None:
                y = y.astype(cd)
        nu = self.correlation
        pr = self.chain_precision
        if self.element_dependent:
            out = jnp.einsum("...ik,ekc,bci,be->bc...", U[nu], W[nu], x, y,
                             precision=pr)
            for nu in range(self.correlation - 1, 0, -1):
                c = jnp.einsum("...k,ekc,be->bc...", U[nu], W[nu], y,
                               precision=pr) + out
                out = jnp.einsum("bc...i,bci->bc...", c, x, precision=pr)
        elif self.fused_lowrank and self.correlation <= 3:
            out = self._fused_chain(x, U, W, D)
        else:
            out = jnp.einsum("...ik,kc,bci->bc...", U[nu], W[nu], x,
                             precision=pr)
            for nu in range(self.correlation - 1, 0, -1):
                c = jnp.einsum("...k,kc->c...", U[nu], W[nu],
                               precision=pr) + out
                out = jnp.einsum("bc...i,bci->bc...", c, x, precision=pr)
        out = out.astype(in_dtype)
        # out: [n, c, D] in irreps_out block order -> [n, sum c*d_out]
        return self._split_out(out, irs_out)

    def _fused_chain(self, x, U, W, D):
        """Reassociated evaluation of the descending-nu chain (corr<=3,
        element-independent): identical parameters and math, no giant.

        The chain's [b,c,D,d,d] intermediate exists only because the Horner
        form keeps all leading output axes while contracting x one power at
        a time.  But both contraction operands derive from the same [b,c,d]
        x, so expanding the polynomial collapses everything into
            out2[b,c,(D,j1)] = z[b,c,:] @ M[c,:,:]
        with z = [x⊗x (flattened), x] of width d^2+d and M the U3W3/U2W2
        projection matrices — one MXU-friendly batched GEMM (batch=c) whose
        largest tensor is x⊗x at [b,c,d,d] (16x smaller than the chain's
        giant at d=16).  The final U1W1 + contraction with x is unchanged.
        Measured: the chain giant dominated MACE's step HBM traffic; see
        RESULTS.md.
        """
        b, c, d = x.shape
        nu = self.correlation
        pr = self.chain_precision
        A1 = jnp.einsum("...k,kc->c...", U[1], W[1],
                        precision=pr)                           # [c, D, j1]
        if nu == 1:
            return jnp.einsum("bci,cDi->bcD", x, A1, precision=pr)
        # A2: [c, D, j1, i] -> [c, i, (D, j1)]
        A2 = jnp.einsum("...k,kc->c...", U[2], W[2], precision=pr)
        A2 = jnp.transpose(A2, (0, 3, 1, 2)).reshape(c, d, D * d)
        if nu == 3:
            # A3: [c, D, j1, j2, i] -> [c, (i, j2), (D, j1)]
            A3 = jnp.einsum("...k,kc->c...", U[3], W[3], precision=pr)
            A3 = jnp.transpose(A3, (0, 4, 3, 1, 2)).reshape(c, d * d, D * d)
            M = jnp.concatenate([A3, A2], axis=1)               # [c, d²+d, Dd]
            xx = jnp.einsum("bci,bcj->bcij", x, x,
                            precision=pr).reshape(b, c, d * d)
            z = jnp.concatenate([xx, x], axis=-1)               # [b, c, d²+d]
            out2 = jnp.einsum("bcz,czq->bcq", z, M, precision=pr)
        else:  # nu == 2
            out2 = jnp.einsum("bci,ciq->bcq", x, A2, precision=pr)
        out2 = out2.reshape(b, c, D, d) + A1[None]
        return jnp.einsum("bcqj,bcj->bcq", out2, x, precision=pr)

    def _split_out(self, out, irs_out):
        # out: [n, c, D] in irreps_out block order -> [n, sum c*d_out]
        outs, o = [], 0
        for ir in irs_out:
            blk = out[..., o : o + ir.dim]
            outs.append(blk.reshape(blk.shape[0], -1))
            o += ir.dim
        return jnp.concatenate(outs, axis=-1)
