"""Mathematical identities for the irreps core.

These are the ground-truth checks everything equivariant builds on:
if these pass, the CG tensors and Wigner-D matrices are mutually consistent.
"""

import numpy as np
import pytest
from scipy.stats import ortho_group, special_ortho_group

from geometric_message_passing_tpu import irreps as ir


def random_rotation(seed):
    return special_ortho_group.rvs(3, random_state=seed)


class TestIrreps:
    def test_parse_dim(self):
        x = ir.Irreps("64x0e+64x1o+64x2e")
        assert x.dim == 64 * (1 + 3 + 5)
        assert x.num_irreps == 192
        assert str(x) == "64x0e+64x1o+64x2e"

    def test_sh_irreps_times_mul(self):
        sh = ir.Irreps.spherical_harmonics(2)
        hidden = (sh * 64).sort().simplify()
        assert str(hidden) == "64x0e+64x1o+64x2e"

    def test_product_selection_rule(self):
        out = list(ir.Irrep.parse("1o") * ir.Irrep.parse("2e"))
        assert [str(o) for o in out] == ["1o", "2o", "3o"]

    def test_slices(self):
        x = ir.Irreps("2x0e+1x1o")
        assert x.slices() == [slice(0, 2), slice(2, 5)]


class TestWigner3j:
    @pytest.mark.parametrize("lll", [(0, 0, 0), (1, 1, 0), (1, 1, 1), (1, 1, 2),
                                     (2, 1, 1), (2, 2, 2), (3, 2, 1), (3, 3, 2)])
    def test_unit_norm(self, lll):
        C = ir.wigner_3j(*lll)
        assert np.isclose(np.linalg.norm(C.ravel()), 1.0)

    @pytest.mark.parametrize("lll", [(1, 1, 0), (1, 1, 2), (2, 1, 1), (2, 2, 3),
                                     (3, 2, 1), (3, 3, 3)])
    def test_orthogonality_over_m3(self, lll):
        l1, l2, l3 = lll
        C = ir.wigner_3j(l1, l2, l3)
        G = np.einsum("abm,abn->mn", C, C)
        assert np.allclose(G, np.eye(2 * l3 + 1) / (2 * l3 + 1), atol=1e-10)

    @pytest.mark.parametrize("lll", [(1, 1, 0), (1, 1, 1), (1, 1, 2), (2, 1, 1),
                                     (2, 2, 2), (3, 2, 1), (2, 2, 4), (3, 3, 2)])
    @pytest.mark.parametrize("seed", [0, 1])
    def test_equivariance_identity(self, lll, seed):
        """(D1 x D2) C = C D3 for random rotations."""
        l1, l2, l3 = lll
        R = random_rotation(seed + 10 * sum(lll))
        C = ir.wigner_3j(l1, l2, l3)
        D1 = ir.wigner_D_from_matrix(l1, R)
        D2 = ir.wigner_D_from_matrix(l2, R)
        D3 = ir.wigner_D_from_matrix(l3, R)
        lhs = np.einsum("ai,bj,ijk->abk", D1, D2, C)
        rhs = np.einsum("abj,jk->abk", C, D3)
        assert np.allclose(lhs, rhs, atol=1e-8)


class TestWignerD:
    @pytest.mark.parametrize("l", [1, 2, 3, 4])
    def test_orthogonal(self, l):
        R = random_rotation(l)
        D = ir.wigner_D_from_matrix(l, R)
        assert np.allclose(D @ D.T, np.eye(2 * l + 1), atol=1e-10)

    @pytest.mark.parametrize("l", [1, 2, 3])
    def test_homomorphism(self, l):
        R1, R2 = random_rotation(l + 20), random_rotation(l + 40)
        D12 = ir.wigner_D_from_matrix(l, R1 @ R2)
        assert np.allclose(
            D12,
            ir.wigner_D_from_matrix(l, R1) @ ir.wigner_D_from_matrix(l, R2),
            atol=1e-9,
        )

    def test_parity_rep(self):
        """O(3): an odd-parity irrep picks up det(R)."""
        Q = ortho_group.rvs(3, random_state=7)
        det = np.linalg.det(Q)
        rep_1o = ir.irrep_rep(ir.Irrep.parse("1o"), Q, det)
        # for l=1 odd parity, the rep of any orthogonal Q is just Q itself
        # in the (y,z,x) basis: det * D(det*Q) = det^2 * P Q P^T = P Q P^T
        P = ir._P_YZX
        assert np.allclose(rep_1o, P @ Q @ P.T, atol=1e-10)


class TestUMatrix:
    def test_scalar_output_shape(self):
        x = ir.Irreps("1x0e+1x1o+1x2e")
        U = ir.u_matrix_real(x, ir.Irrep.parse("0e"), 2)
        # [d, d, n_paths], d = 9
        assert U.ndim == 3 and U.shape[0] == 9 and U.shape[1] == 9
        assert U.shape[-1] > 0

    def test_vector_output_shape(self):
        x = ir.Irreps("1x0e+1x1o+1x2e")
        U = ir.u_matrix_real(x, ir.Irrep.parse("1o"), 3)
        assert U.ndim == 5 and U.shape[0] == 3 and U.shape[1:4] == (9, 9, 9)

    @pytest.mark.parametrize("out_s", ["0e", "1o", "2e"])
    def test_u_matrix_equivariance(self, out_s):
        """Operational equivariance: contracting U with rotated inputs equals
        rotating the contraction (the property SymmetricContraction relies on)."""
        x = ir.Irreps("1x0e+1x1o+1x2e")
        R = random_rotation(3)
        D = ir.irreps_rep(x, R, 1.0)
        ir_out = ir.Irrep.parse(out_s)
        U = ir.u_matrix_real(x, ir_out, 2)
        if ir_out.dim == 1:
            U = U[None]  # restore squeezed output axis
        Dout = ir.irrep_rep(ir_out, R, 1.0)
        rng = np.random.default_rng(0)
        v1, v2 = rng.normal(size=(2, x.dim))
        out = np.einsum("oijn,i,j->on", U, v1, v2)
        out_rot = np.einsum("oijn,i,j->on", U, D @ v1, D @ v2)
        assert np.allclose(out_rot, Dout @ out, atol=1e-8)
