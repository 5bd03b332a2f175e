"""Golden-value tests for the e3nn-dependent numerics (VERDICT round-2 #6).

e3nn is not installed in this image, so the TFN/MACE path cannot be oracled
by executing the reference modules (tfn_layer.py:68-85, blocks.py:121-135,
symmetric_contraction.py:150-185).  These tests pin the same conventions by
hand-derived closed forms instead:

* wigner_3j scale conventions (unit Frobenius norm; w3j(0,l,l)=I/sqrt(2l+1))
* FullyConnectedTensorProduct with irrep_normalization='component' and
  path_normalization='element': for 1x1o (x) 1x1o -> 0e+1e+2e the outputs
  are exactly the irrep projections of x (x) y:
      ||out_l||^2 = w_l^2 ||P_l(x (x) y)||^2
  with closed forms for each ||P_l||, and scalar (x) V = w * s * V.
* U_matrix_real closed forms at correlation 1-2 (cg.py:19-133 conventions).
* e3nn nn.BatchNorm: a faithful pure-torch stand-in (written from e3nn
  0.5.x semantics: component normalization, reduce='mean', momentum 0.1,
  batch stats in training / running stats in eval, scalars mean-centred)
  compared step-by-step against EquivariantBatchNorm, including running-
  stat trajectories and the masked (padded-node) path.

Signs and per-irrep basis orientation are NOT pinned (an overall orthogonal
change of basis per irrep leaves the framework's training dynamics exactly
invariant because every consumer uses the same wigner_3j); magnitudes and
coupling structure are.
"""

import math

import numpy as np
import pytest

from geometric_message_passing_tpu.irreps import (
    Irrep,
    Irreps,
    u_matrix_real,
    wigner_3j,
)


# ---------------------------------------------------------------------------
# wigner_3j scale conventions
# ---------------------------------------------------------------------------


def test_w3j_000_is_one():
    np.testing.assert_allclose(wigner_3j(0, 0, 0), np.ones((1, 1, 1)))


@pytest.mark.parametrize("l", [1, 2, 3])
def test_w3j_scalar_coupling_is_scaled_identity(l):
    # 0e (x) l -> l must be the identity / sqrt(2l+1) up to overall sign
    C = wigner_3j(0, l, l)[0]
    d = 2 * l + 1
    np.testing.assert_allclose(np.abs(C), np.eye(d) / math.sqrt(d), atol=1e-12)
    # ... and the diagonal has a consistent sign (a true multiple of I)
    diag = np.diag(C)
    np.testing.assert_allclose(diag, diag[0], atol=1e-12)


def test_w3j_111_is_levi_civita_over_sqrt6():
    C = wigner_3j(1, 1, 1)
    eps = np.zeros((3, 3, 3))
    # |C| must be |levi-civita|/sqrt(6) in ANY right-handed real basis
    for i, j, k in [(0, 1, 2), (1, 2, 0), (2, 0, 1)]:
        eps[i, j, k] = eps[j, i, k] = 1
    np.testing.assert_allclose(np.abs(C), eps / math.sqrt(6), atol=1e-12)
    # antisymmetry in the two inputs
    np.testing.assert_allclose(C, -np.swapaxes(C, 0, 1), atol=1e-12)


@pytest.mark.parametrize("lll", [(1, 1, 2), (2, 2, 2), (1, 2, 3), (2, 3, 1)])
def test_w3j_unit_frobenius_norm(lll):
    C = wigner_3j(*lll)
    np.testing.assert_allclose(np.linalg.norm(C), 1.0, atol=1e-12)


# ---------------------------------------------------------------------------
# FCTP golden values (component + element normalization)
# ---------------------------------------------------------------------------


def _edge_tp(irreps_in, irreps_sh, irreps_out):
    from geometric_message_passing_tpu.nn.tensor_product import (
        EdgeTensorProduct,
    )

    return EdgeTensorProduct(
        Irreps(irreps_in), Irreps(irreps_sh), Irreps(irreps_out)
    )


def test_fctp_scalar_times_vector_is_plain_scale():
    """0e (x) 1o -> 1o: path_weight sqrt(3) cancels the w3j 1/sqrt(3), so
    out = w * s * V exactly (up to one global sign pinned by w3j(0,1,1))."""
    tp = _edge_tp("1x0e", "1x1o", "1x1o")
    assert tp.weight_numel == 1
    rng = np.random.default_rng(0)
    s = rng.standard_normal((4, 1)).astype(np.float32)
    V = rng.standard_normal((4, 3)).astype(np.float32)
    w = rng.standard_normal((4, 1)).astype(np.float32)
    out = np.asarray(tp.apply(s, V, w))
    sign = np.sign(wigner_3j(1, 0, 1)[0, 0, 0])
    np.testing.assert_allclose(out, sign * w * s * V, rtol=1e-5, atol=1e-6)


def test_fctp_vector_vector_projections():
    """1x1o (x) 1x1o -> 1x0e+1x1e+1x2e reproduces the closed-form irrep
    projection magnitudes of x (x) y (hand-derived; the substitute for the
    impossible e3nn activation oracle)."""
    out_irreps = Irreps("1x0e+1x1e+1x2e")
    tp = _edge_tp("1x1o", "1x1o", out_irreps)
    assert tp.weight_numel == 3
    rng = np.random.default_rng(1)
    E = 16
    x = rng.standard_normal((E, 3)).astype(np.float64)
    y = rng.standard_normal((E, 3)).astype(np.float64)
    w = rng.standard_normal((E, 3)).astype(np.float64)
    out = np.asarray(
        tp.apply(x.astype(np.float32), y.astype(np.float32),
                 w.astype(np.float32))
    ).astype(np.float64)
    o0, o1, o2 = out[:, :1], out[:, 1:4], out[:, 4:9]

    dots = (x * y).sum(-1)
    n2x = (x * x).sum(-1)
    n2y = (y * y).sum(-1)
    cross2 = np.square(np.cross(x, y)).sum(-1)

    # weight order follows path enumeration (0e, 1e, 2e for sorted outputs)
    w0, w1, w2 = w[:, 0], w[:, 1], w[:, 2]

    # l=0: w * (x.y)/sqrt(3)
    np.testing.assert_allclose(
        np.abs(o0[:, 0]), np.abs(w0 * dots / math.sqrt(3)), rtol=1e-4
    )
    # l=1: ||out|| = |w| ||x x y|| / sqrt(2)
    np.testing.assert_allclose(
        np.square(o1).sum(-1), w1**2 * cross2 / 2.0, rtol=1e-4
    )
    # l=2: ||out||^2 = w^2 [ (|x|^2|y|^2 + (x.y)^2)/2 - (x.y)^2/3 ]
    np.testing.assert_allclose(
        np.square(o2).sum(-1),
        w2**2 * ((n2x * n2y + dots**2) / 2.0 - dots**2 / 3.0),
        rtol=1e-4,
    )

    # the 1e channel is the antisymmetric coupling: swapping x and y flips it
    out_sw = np.asarray(
        tp.apply(y.astype(np.float32), x.astype(np.float32),
                 w.astype(np.float32))
    ).astype(np.float64)
    np.testing.assert_allclose(out_sw[:, 1:4], -o1, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(out_sw[:, :1], o0, rtol=1e-4, atol=1e-6)


def test_fctp_path_weight_fan_in():
    """Two input irreps feeding one output: fan = sum(mul1*mul2) over the
    contributing paths, i.e. doubling the contributing paths scales each
    path's output by 1/sqrt(2)."""
    tp1 = _edge_tp("1x0e", "1x1o", "1x1o")
    tp2 = _edge_tp("1x0e+1x2e", "1x1o", "1x1o")  # 0ex1o->1o and 2ex1o->1o
    rng = np.random.default_rng(2)
    s = rng.standard_normal((8, 1)).astype(np.float32)
    V = rng.standard_normal((8, 3)).astype(np.float32)
    x2 = np.concatenate([s, np.zeros((8, 5), np.float32)], axis=-1)
    w1 = np.ones((8, tp1.weight_numel), np.float32)
    w2 = np.ones((8, tp2.weight_numel), np.float32)
    out1 = np.asarray(tp1.apply(s, V, w1))
    out2 = np.asarray(tp2.apply(x2, V, w2))
    np.testing.assert_allclose(out2, out1 / math.sqrt(2), rtol=1e-5,
                               atol=1e-6)


def test_uvu_tp_scalar_identity():
    """'uvu' conv_tp (blocks.py:218-225 math): u-channel scalars (x) 1o with
    path_weight sqrt(dim_out/mul2)=sqrt(3) gives out[u] = w[u] s[u] V."""
    from geometric_message_passing_tpu.nn.tensor_product import (
        EdgeTensorProductUVU,
    )

    tp = EdgeTensorProductUVU(
        Irreps("4x0e"), Irreps("1x1o"), Irreps("4x1o")
    )
    assert tp.weight_numel == 4
    rng = np.random.default_rng(3)
    s = rng.standard_normal((5, 4)).astype(np.float32)
    V = rng.standard_normal((5, 3)).astype(np.float32)
    w = rng.standard_normal((5, 4)).astype(np.float32)
    out = np.asarray(tp.apply(s, V, w)).reshape(5, 4, 3)
    sign = np.sign(wigner_3j(1, 0, 1)[0, 0, 0])
    np.testing.assert_allclose(
        out, sign * (w * s)[:, :, None] * V[:, None, :], rtol=1e-5, atol=1e-6
    )


def test_irreps_linear_unit_second_moment():
    """o3.Linear semantics: N(0,1) internal weights + 1/sqrt(fan) element
    normalization preserve the component second moment."""
    import jax

    from geometric_message_passing_tpu.nn.equivariant import IrrepsLinear

    irreps = Irreps("8x0e+8x1o+8x2e")
    lin = IrrepsLinear(irreps, irreps)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((4096, irreps.dim)).astype(np.float32)
    variables = lin.init(jax.random.PRNGKey(0), x[:1])
    y = np.asarray(lin.apply(variables, x))
    m2 = float(np.mean(y**2))
    assert 0.9 < m2 < 1.1, m2


# ---------------------------------------------------------------------------
# U_matrix_real closed forms (cg.py conventions)
# ---------------------------------------------------------------------------


def test_u_matrix_corr1_is_identity_basis():
    U = u_matrix_real(Irreps("1x0e+1x1o"), Irrep(1, -1), 1)
    # [d_out, d_in, n_paths] = [3, 4, 1]; the single path embeds the 1o block
    assert U.shape == (3, 4, 1)
    np.testing.assert_allclose(U[:, 1:, 0], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(U[:, 0, 0], 0.0, atol=1e-12)


def test_u_matrix_corr2_scalar_coupling():
    # 1o (x) 1o -> 0e: U[i,j] = +-delta_ij / sqrt(3) (w3j * sqrt(d_out=1))
    U = u_matrix_real(Irreps("1x1o"), Irrep(0, 1), 2)
    assert U.shape == (3, 3, 1)
    np.testing.assert_allclose(
        np.abs(U[:, :, 0]), np.eye(3) / math.sqrt(3), atol=1e-12
    )


def test_u_matrix_corr2_component_scale():
    # component normalization: each coupling path's tensor has Frobenius
    # norm sqrt(d_out) (cg.py:56-57 scales the unit-norm 3j by sqrt(d_out))
    for ir_out in [Irrep(0, 1), Irrep(1, 1), Irrep(2, 1)]:
        U = u_matrix_real(Irreps("1x1o"), ir_out, 2)
        n_paths = U.shape[-1]
        assert n_paths == 1
        np.testing.assert_allclose(
            np.linalg.norm(U[..., 0]), math.sqrt(ir_out.dim), atol=1e-10
        )


def test_u_matrix_corr3_matches_recursion_of_corr2():
    """corr-3 U must be the corr-2 U coupled once more with a scaled w3j —
    the recursion invariant of cg.py:43-88 (checked for the fully scalar
    output where the chain is unambiguous)."""
    irreps = Irreps("1x0e+1x1o")
    U3 = u_matrix_real(irreps, Irrep(0, 1), 3)
    # every path tensor norm must be a product of per-step sqrt(d_mid)
    # factors; for the scalar output each step's 3j is unit norm scaled by
    # sqrt(d_out_step), so norms are sqrt of integer dims
    norms = np.linalg.norm(U3.reshape(-1, U3.shape[-1]), axis=0)
    for n in norms:
        assert any(
            abs(n - math.sqrt(k)) < 1e-8 for k in (1, 2, 3, 4, 5, 7, 9)
        ), norms


# ---------------------------------------------------------------------------
# e3nn nn.BatchNorm oracle (pure-torch stand-in vs EquivariantBatchNorm)
# ---------------------------------------------------------------------------


class _RefBatchNorm:
    """Faithful numpy stand-in for e3nn.nn.BatchNorm (0.5.x semantics,
    defaults: normalization='component', reduce='mean', momentum=0.1,
    affine), as instantiated at tfn_layer.py:80.  Training mode normalizes
    by BATCH statistics and rolls running stats; eval mode uses running
    stats.  Scalars (l==0, p==1) are mean-centred; every irrep is RMS
    normalized per multiplicity channel."""

    def __init__(self, irreps, eps=1e-5, momentum=0.1):
        self.irreps = Irreps(irreps)
        self.eps = eps
        self.momentum = momentum
        n_scalar = sum(
            mul for mul, ir in self.irreps if ir.l == 0 and ir.p == 1
        )
        n_feat = sum(mul for mul, _ in self.irreps)
        self.running_mean = np.zeros(n_scalar)
        self.running_var = np.ones(n_feat)
        self.weight = np.ones(n_feat)
        self.bias = np.zeros(n_scalar)

    def __call__(self, x, training):
        N = x.shape[0]
        fields = []
        ix = irm = irv = iw = ib = 0
        new_means, new_vars = [], []
        for mul, ir in self.irreps:
            d = ir.dim
            field = x[:, ix : ix + mul * d].reshape(N, mul, d).copy()
            ix += mul * d
            is_scalar = ir.l == 0 and ir.p == 1
            if is_scalar:
                if training:
                    fm = field.mean(axis=(0, 2))
                    new_means.append(
                        (1 - self.momentum)
                        * self.running_mean[irm : irm + mul]
                        + self.momentum * fm
                    )
                else:
                    fm = self.running_mean[irm : irm + mul]
                irm += mul
                field = field - fm[None, :, None]
            if training:
                fn = np.square(field).mean(-1).mean(0)  # component, mean
                new_vars.append(
                    (1 - self.momentum) * self.running_var[irv : irv + mul]
                    + self.momentum * fn
                )
            else:
                fn = self.running_var[irv : irv + mul]
            irv += mul
            inv = (fn + self.eps) ** -0.5
            inv = inv * self.weight[iw : iw + mul]
            iw += mul
            field = field * inv[None, :, None]
            if is_scalar:
                field = field + self.bias[ib : ib + mul][None, :, None]
                ib += mul
            fields.append(field.reshape(N, mul * d))
        if training:
            if new_means:
                self.running_mean = np.concatenate(new_means)
            self.running_var = np.concatenate(new_vars)
        return np.concatenate(fields, axis=1)


IRREPS_BN = Irreps("3x0e+2x0o+4x1o+2x2e")


def _bn_pair():
    import jax

    from geometric_message_passing_tpu.nn.equivariant import (
        EquivariantBatchNorm,
    )

    bn = EquivariantBatchNorm(IRREPS_BN)
    x0 = np.zeros((2, IRREPS_BN.dim), np.float32)
    variables = bn.init(jax.random.PRNGKey(0), x0)
    return bn, variables, _RefBatchNorm(IRREPS_BN)


def _sync_check(variables, ref):
    """Compare flax batch_stats against the stand-in's flat buffers."""
    stats = variables["batch_stats"]
    means, varis = [], []
    for k, (mul, ir) in enumerate(IRREPS_BN):
        if ir.l == 0 and ir.p == 1:
            means.append(np.asarray(stats[f"mean{k}"]))
        varis.append(np.asarray(stats[f"var{k}"]))
    np.testing.assert_allclose(
        np.concatenate(means), ref.running_mean, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.concatenate(varis), ref.running_var, rtol=1e-5, atol=1e-6
    )


def test_equivariant_batchnorm_matches_e3nn_standin():
    bn, variables, ref = _bn_pair()
    rng = np.random.default_rng(7)
    # three training steps with different data, then eval: outputs AND the
    # running-stat trajectory must match the e3nn semantics step for step
    for step in range(3):
        x = (
            2.5 * rng.standard_normal((40, IRREPS_BN.dim)) + 0.7 * step
        ).astype(np.float32)
        y, updates = bn.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        variables = {**variables, **updates}
        y_ref = ref(x.astype(np.float64), training=True)
        np.testing.assert_allclose(
            np.asarray(y), y_ref, rtol=2e-4, atol=2e-4
        )
        _sync_check(variables, ref)
    x = rng.standard_normal((16, IRREPS_BN.dim)).astype(np.float32)
    y_eval = bn.apply(variables, x, train=False)
    y_ref = ref(x.astype(np.float64), training=False)
    np.testing.assert_allclose(
        np.asarray(y_eval), y_ref, rtol=2e-4, atol=2e-4
    )


def test_equivariant_batchnorm_masked_matches_subset():
    """The masked path (padded nodes) must reproduce the stand-in run on
    only the real rows — pad nodes contribute nothing to batch stats."""
    bn, variables, ref = _bn_pair()
    rng = np.random.default_rng(8)
    n_real = 25
    x_real = (1.5 * rng.standard_normal((n_real, IRREPS_BN.dim))).astype(
        np.float32
    )
    x = np.concatenate(
        [x_real, np.zeros((15, IRREPS_BN.dim), np.float32)], axis=0
    )
    mask = np.zeros(40, bool)
    mask[:n_real] = True
    y, updates = bn.apply(
        variables, x, train=True, mask=mask, mutable=["batch_stats"]
    )
    variables = {**variables, **updates}
    y_ref = ref(x_real.astype(np.float64), training=True)
    np.testing.assert_allclose(
        np.asarray(y)[:n_real], y_ref, rtol=2e-4, atol=2e-4
    )
    _sync_check(variables, ref)


# ---------------------------------------------------------------------------
# Composed golden: one full TensorProductConvLayer forward (round-4 VERDICT
# item 8).  Everything below the flax layer is re-derived by hand in f64
# numpy — hand-coded Wigner-3j closed forms, e3nn 'element' path
# normalization computed from scratch, the fc-MLP + per-group weight heads,
# the reference's dst->src aggregation quirk (tfn_layer.py:83-87), edge
# masking, and a BatchNorm TRAIN step (batch stats + running-stat roll).
# The only thing shared with the library is the extracted parameter arrays.
# ---------------------------------------------------------------------------


def _conv_golden_setup():
    import jax

    global jnp
    import jax.numpy as jnp

    from geometric_message_passing_tpu.nn.conv import TensorProductConvLayer

    in_irreps = Irreps("2x0e+2x1o")
    sh_irreps = Irreps("1x0e+1x1o")
    out_irreps = Irreps("2x0e+2x1o")
    layer = TensorProductConvLayer(
        in_irreps=in_irreps, out_irreps=out_irreps, sh_irreps=sh_irreps,
        mlp_dim=5, batch_norm=True)
    rng = np.random.default_rng(42)
    N, E = 4, 6
    nf = rng.standard_normal((N, in_irreps.dim)).astype(np.float32)
    sh = rng.standard_normal((E, sh_irreps.dim)).astype(np.float32)
    ef = rng.standard_normal((E, 3)).astype(np.float32)
    snd = np.array([0, 1, 2, 3, 0, 1], np.int32)
    rcv = np.array([1, 2, 3, 0, 2, 3], np.int32)
    # last edge is padding: must not contribute to node 1
    mask = np.array([1, 1, 1, 1, 1, 0], bool)
    variables = layer.init(jax.random.PRNGKey(3), nf, snd, rcv, sh, ef)
    return layer, variables, (nf, snd, rcv, sh, ef, mask), (N, E)


def _conv_golden_numpy(params, nf, snd, rcv, sh, ef, mask, N):
    """f64 hand derivation of the layer forward up to (and excluding) BN."""
    # -- hand-coded unit-Frobenius Wigner 3j in the (y,z,x) l=1 basis.
    # w3j(0,0,0)=1; w3j(0,1,1)=w3j(1,0,1)=I/sqrt(3) (scalar coupling is a
    # scaled identity); w3j(1,1,0)[i,j]=delta_ij/sqrt(3) (the invariant
    # bilinear of two vectors is the dot product).
    s3 = 1.0 / math.sqrt(3.0)
    # -- e3nn path normalization (component/element), derived from scratch:
    # both output groups are fed by two paths of fan mul1*mul2 = 2 each, so
    # alpha(0e) = sqrt(dim(0e)/4) = 1/2, alpha(1o) = sqrt(3/4).
    a0 = math.sqrt(1.0 / 4.0)
    a1 = math.sqrt(3.0 / 4.0)
    # -- fc MLP trunk (one Dense + relu, act_final) and the per-group heads
    K0 = np.asarray(params["fc"]["Dense_0"]["kernel"], np.float64)
    b0 = np.asarray(params["fc"]["Dense_0"]["bias"], np.float64)
    a = np.maximum(ef.astype(np.float64) @ K0 + b0, 0.0)
    W = []
    for g in range(2):
        Kg = np.asarray(params[f"fc_out{g}"]["kernel"], np.float64)
        bg = np.asarray(params[f"fc_out{g}"]["bias"], np.float64)
        # [E, n_p=2, u=2, w=2] — path-major, then (u, w) row-major
        W.append((a @ Kg + bg).reshape(-1, 2, 2, 2))
    E = nf.shape[0] and sh.shape[0]
    x = nf.astype(np.float64)[rcv]           # dst gather (the quirk)
    x0 = x[:, 0:2].reshape(E, 2, 1)          # 2x0e
    x1 = x[:, 2:8].reshape(E, 2, 3)          # 2x1o
    s0 = sh.astype(np.float64)[:, 0]         # 1x0e
    s1 = sh.astype(np.float64)[:, 1:4]       # 1x1o
    # group 0e: paths (0e x 0e -> 0e), (1o x 1o -> 0e)
    t00 = a0 * x0[:, :, 0] * s0[:, None]                       # [E, u]
    t01 = a0 * s3 * np.einsum("eum,em->eu", x1, s1)            # [E, u]
    out0 = np.einsum("euw,eu->ew", W[0][:, 0], t00) + np.einsum(
        "euw,eu->ew", W[0][:, 1], t01)                         # [E, w]
    # group 1o: paths (0e x 1o -> 1o), (1o x 0e -> 1o)
    t10 = a1 * s3 * x0[:, :, 0:1] * s1[:, None, :]             # [E, u, 3]
    t11 = a1 * s3 * x1 * s0[:, None, None]                     # [E, u, 3]
    out1 = np.einsum("euw,eum->ewm", W[1][:, 0], t10) + np.einsum(
        "euw,eum->ewm", W[1][:, 1], t11)                       # [E, w, 3]
    msg = np.concatenate([out0, out1.reshape(E, 6)], axis=1)
    msg = msg * mask[:, None]
    agg = np.zeros((N, 8))
    np.add.at(agg, snd, msg)                 # scatter to src (the quirk)
    return agg


def test_tp_conv_layer_composed_golden():
    import jax

    layer, variables, (nf, snd, rcv, sh, ef, mask), (N, E) = (
        _conv_golden_setup())
    y, updates = layer.apply(
        variables, nf, snd, rcv, sh, ef, edge_mask=jnp.asarray(mask),
        train=True, mutable=["batch_stats"])
    agg = _conv_golden_numpy(variables["params"], nf, snd, rcv, sh, ef,
                             mask, N)
    ref_bn = _RefBatchNorm(Irreps("2x0e+2x1o"))
    y_ref = ref_bn(agg, training=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-5)
    # the BN TRAIN step must also have rolled the running stats exactly
    stats = updates["batch_stats"]["_bn"]
    np.testing.assert_allclose(np.asarray(stats["mean0"]),
                               ref_bn.running_mean, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(stats["var0"]),
                        np.asarray(stats["var1"])]),
        ref_bn.running_var, rtol=1e-5, atol=1e-7)


def test_tp_conv_layer_composed_golden_per_path_dispatch(monkeypatch):
    """The same golden must hold on the per-path fallback (the >=4096-edge
    scale dispatch of EdgeTensorProductUVU has its FCTP analog here in
    _apply_per_path): force it by monkeypatching away the combined path."""
    from geometric_message_passing_tpu.nn.tensor_product import (
        EdgeTensorProduct,
    )

    layer, variables, (nf, snd, rcv, sh, ef, mask), (N, E) = (
        _conv_golden_setup())
    monkeypatch.setattr(
        EdgeTensorProduct, "_apply_combined",
        lambda self, x, sh, weights, ws=None: self._apply_per_path(
            x, sh,
            weights if ws is None else jnp.concatenate(ws, axis=-1)))
    y, _ = layer.apply(
        variables, nf, snd, rcv, sh, ef, edge_mask=jnp.asarray(mask),
        train=True, mutable=["batch_stats"])
    agg = _conv_golden_numpy(variables["params"], nf, snd, rcv, sh, ef,
                             mask, N)
    y_ref = _RefBatchNorm(Irreps("2x0e+2x1o"))(agg, training=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-5)
