"""Fused/combined compute paths must match their per-path reference forms.

The TPU-first kernels collapse per-CG-path einsums into single combined
contractions (kernel-count is the bottleneck at our graph sizes — see
nn/tensor_product.py, nn/symmetric_contraction.py, nn/equivariant.py).
These tests pin the combined forms to the straightforward per-path math.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometric_message_passing_tpu.irreps import Irreps
from geometric_message_passing_tpu.nn.equivariant import (
    IrrepsLinear, merge_blocks, split_blocks,
)
from geometric_message_passing_tpu.nn.symmetric_contraction import (
    Contraction, SymmetricContraction,
)
from geometric_message_passing_tpu.nn.tensor_product import (
    EdgeTensorProduct, EdgeTensorProductUVU,
)

CASES = [
    ("8x0e", "1x0e+1x1o+1x2e+1x3o", "8x0e+8x1o+8x2e+8x3o"),
    ("8x0e+8x1o+8x2e+8x3o", "1x0e+1x1o+1x2e+1x3o", "8x0e+8x1o+8x2e+8x3o"),
    ("4x0e+4x0o+4x1e+4x1o+4x2e", "1x0e+1x1o+1x2e", "4x0e+4x0o+4x1o+4x2e"),
]


@pytest.mark.parametrize("in_ir,sh_ir,out_ir", CASES)
def test_fctp_combined_matches_per_path(in_ir, sh_ir, out_ir):
    rng = np.random.default_rng(0)
    tp = EdgeTensorProduct(Irreps(in_ir), Irreps(sh_ir), Irreps(out_ir))
    assert tp._uniform_mul is not None
    E = 7
    x = rng.standard_normal((E, Irreps(in_ir).dim)).astype(np.float32)
    sh = rng.standard_normal((E, Irreps(sh_ir).dim)).astype(np.float32)
    w = rng.standard_normal((E, tp.weight_numel)).astype(np.float32)
    np.testing.assert_allclose(
        tp._apply_combined(x, sh, w), tp._apply_per_path(x, sh, w),
        atol=2e-5,
    )


@pytest.mark.parametrize("in_ir,sh_ir,out_ir", CASES)
def test_fctp_grouped_weights_match_flat(in_ir, sh_ir, out_ir):
    """apply_grouped (per-group weight tensors straight from the per-group
    MLP heads — the production path in nn/conv.py) must equal apply on the
    concatenated flat vector."""
    rng = np.random.default_rng(7)
    tp = EdgeTensorProduct(Irreps(in_ir), Irreps(sh_ir), Irreps(out_ir))
    E = 6
    x = rng.standard_normal((E, Irreps(in_ir).dim)).astype(np.float32)
    sh = rng.standard_normal((E, Irreps(sh_ir).dim)).astype(np.float32)
    w = rng.standard_normal((E, tp.weight_numel)).astype(np.float32)
    sizes = tp.group_weight_numels
    assert sum(sizes) == tp.weight_numel
    ws = jnp.split(jnp.asarray(w), np.cumsum(sizes)[:-1].tolist(), axis=-1)
    np.testing.assert_allclose(
        np.asarray(tp.apply_grouped(x, sh, ws)),
        np.asarray(tp.apply(x, sh, w)), atol=1e-6)


@pytest.mark.parametrize("in_ir,sh_ir,out_ir", CASES)
def test_uvu_combined_matches_per_path(in_ir, sh_ir, out_ir):
    rng = np.random.default_rng(1)
    tp = EdgeTensorProductUVU(Irreps(in_ir), Irreps(sh_ir), Irreps(out_ir))
    assert tp._uniform_mul is not None
    E = 7
    x = rng.standard_normal((E, Irreps(in_ir).dim)).astype(np.float32)
    sh = rng.standard_normal((E, Irreps(sh_ir).dim)).astype(np.float32)
    w = rng.standard_normal((E, tp.weight_numel)).astype(np.float32)
    np.testing.assert_allclose(
        tp._apply_combined(x, sh, w), tp._apply_per_path(x, sh, w),
        atol=2e-5,
    )


@pytest.mark.parametrize("elem_dep", [False, True])
def test_symmetric_contraction_fused_matches_per_irrep(elem_dep):
    rng = np.random.default_rng(2)
    irreps = Irreps("8x0e+8x1o+8x2e+8x3o")
    coupling = Irreps([(1, ir) for _, ir in irreps])
    n, c = 5, 8
    d = sum(ir.dim for _, ir in coupling)
    x = rng.standard_normal((n, c, d)).astype(np.float32)
    y = num_el = None
    if elem_dep:
        num_el = 3
        y = np.eye(3, dtype=np.float32)[rng.integers(0, 3, n)]
    # chain_dtype=None: structural equivalence is exact only in full f32
    sc = SymmetricContraction(
        irreps_in=irreps, irreps_out=irreps, correlation=3,
        element_dependent=elem_dep, num_elements=num_el, chain_dtype=None,
    )
    vars_ = sc.init(jax.random.PRNGKey(1), x, y)
    fused = sc.apply(vars_, x, y)
    outs = []
    for _, ir in irreps:
        con = Contraction(
            irreps_in=coupling, ir_out=ir, correlation=3, num_features=c,
            element_dependent=elem_dep, num_elements=num_el,
        )
        cw = {f"w{nu}": vars_["params"][f"contraction_{ir}_w{nu}"]
              for nu in (1, 2, 3)}
        cv = con.init(jax.random.PRNGKey(0), x, y)
        outs.append(con.apply({"params": cw, "u_tables": cv["u_tables"]}, x, y))
    ref = jnp.concatenate(outs, axis=-1)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-5 * max(scale, 1.0))


@pytest.mark.parametrize("corr", [1, 2, 3])
def test_symmetric_contraction_lowrank_matches_chain(corr):
    """fused_lowrank reassociation (no [n,c,D,d,d] giant) == the
    descending-nu reference chain: same params, outputs AND grads."""
    rng = np.random.default_rng(7)
    irreps = Irreps("8x0e+8x1o+8x2e+8x3o")
    n, c = 5, 8
    d = sum(ir.dim for _, ir in Irreps([(1, ir) for _, ir in irreps]))
    x = jnp.asarray(rng.standard_normal((n, c, d)), jnp.float32)
    kw = dict(irreps_in=irreps, irreps_out=irreps, correlation=corr)
    lowrank = SymmetricContraction(**kw, fused_lowrank=True)
    chain = SymmetricContraction(**kw, fused_lowrank=False)
    vars_ = chain.init(jax.random.PRNGKey(1), x)
    out_l = lowrank.apply(vars_, x)
    out_c = chain.apply(vars_, x)
    scale = float(jnp.abs(out_c).max())
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_c),
                               atol=1e-5 * max(scale, 1.0))

    def loss(mod):
        def f(p):
            return jnp.sum(jnp.sin(mod.apply({**vars_, "params": p}, x)))
        return jax.grad(f)(vars_["params"])

    gl, gc = loss(lowrank), loss(chain)
    for a, b in zip(jax.tree.leaves(gl), jax.tree.leaves(gc)):
        gs = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5 * max(gs, 1.0))


def test_symmetric_contraction_bf16_chain_close_to_f32():
    """Opt-in chain_dtype=bfloat16 must stay within bf16 rounding of the
    f32 chain (same params), and return f32."""
    rng = np.random.default_rng(4)
    irreps = Irreps("8x0e+8x1o+8x2e+8x3o")
    n, c = 5, 8
    d = sum(ir.dim for _, ir in Irreps([(1, ir) for _, ir in irreps]))
    x = rng.standard_normal((n, c, d)).astype(np.float32)
    kw = dict(irreps_in=irreps, irreps_out=irreps, correlation=3)
    sc16 = SymmetricContraction(**kw, chain_dtype="bfloat16")
    sc32 = SymmetricContraction(**kw, chain_dtype=None)
    vars_ = sc32.init(jax.random.PRNGKey(1), x)
    out16 = sc16.apply(vars_, x)
    out32 = sc32.apply(vars_, x)
    assert out16.dtype == jnp.float32
    scale = float(jnp.abs(out32).max())
    # bf16 has ~8 mantissa bits (eps ~ 7.8e-3); the 3-long chain compounds
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=3e-2 * max(scale, 1.0))


def test_irreps_linear_fast_path_matches_per_irrep():
    rng = np.random.default_rng(3)
    irr = Irreps("8x0e+8x1o+8x2e+8x3o")
    lin = IrrepsLinear(irreps_in=irr, irreps_out=irr)
    x = rng.standard_normal((5, irr.dim)).astype(np.float32)
    v = lin.init(jax.random.PRNGKey(0), x)
    fast = lin.apply(v, x)
    xs = split_blocks(jnp.asarray(x), irr)
    outs = []
    for k, (mul, _) in enumerate(irr):
        W = v["params"][f"w{k}_{k}"]
        outs.append(jnp.einsum("...ud,uw->...wd", xs[k], W) / math.sqrt(mul))
    np.testing.assert_allclose(np.asarray(fast),
                               np.asarray(merge_blocks(outs)), atol=2e-5)


@pytest.mark.parametrize("name", ["dimenet", "spherenet"])
def test_triplet_model_grads_finite_under_heavy_padding(name):
    """Pad edges have dist == 0 and pad triplets degenerate angles; the
    spherical-Bessel closed form and arctan2 both have singular backward
    passes there.  Loss masking does NOT protect shared weights — grads
    must be finite by construction (series branch + safe_arctan2)."""
    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.experiments.train import (
        init_variables, l1_sum_loss, seed_everything, tiny_init_batch)
    from geometric_message_passing_tpu.graph import (
        GraphLoader, batch_graphs, pad_sizes)
    from geometric_message_passing_tpu.models import (
        DimeNetPPModel, SphereNetModel)
    from geometric_message_passing_tpu.triplets import attach_triplets

    data = ds.create_star_graphs(num=4, fold=[7], dim=3, target="max", seed=0)
    # heavy padding: bucket sized for 40 graphs, only 4 real
    pad = pad_sizes(data * 10, 40)
    quads = name == "spherenet"
    model = (DimeNetPPModel(out_dim=1, num_layers=1, pool="first")
             if name == "dimenet"
             else SphereNetModel(out_dim=1, num_layers=1, pool="first"))
    loader = GraphLoader(data, batch_size=40, pad=pad, with_triplets=True,
                         with_quads=quads)
    variables = init_variables(model, seed_everything(0),
                               tiny_init_batch(loader))
    params = variables["params"]
    uv = {k: v for k, v in variables.items() if k != "params"}
    gb = attach_triplets(batch_graphs(data, *pad), with_quads=quads)
    g = jax.grad(lambda p: l1_sum_loss(
        model.apply({"params": p, **uv}, gb), gb))(params)
    for path, leaf in jax.tree_util.tree_flatten_with_path(g)[0]:
        assert bool(jnp.isfinite(leaf).all()), path


def test_fctp_scalar_in2_combined_matches_per_path():
    """Shared-weight FCTP with scalar in2 (the interaction skip-TP shape)."""
    from geometric_message_passing_tpu.irreps import tp_paths, wigner_3j
    from geometric_message_passing_tpu.nn.tensor_product import (
        FullyConnectedTensorProduct,
    )

    rng = np.random.default_rng(4)
    in1, in2, out = (Irreps("8x0e+8x1o+8x2e"), Irreps("4x0e"),
                     Irreps("8x0e+8x1o+8x2e"))
    m = FullyConnectedTensorProduct(irreps_in1=in1, irreps_in2=in2,
                                    irreps_out=out)
    x1 = rng.standard_normal((6, in1.dim)).astype(np.float32)
    x2 = rng.standard_normal((6, in2.dim)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x1, x2)
    fast = m.apply(v, x1, x2)

    paths = sorted(tp_paths(in1, in2, out), key=lambda p: p.i_out)
    xs1 = split_blocks(jnp.asarray(x1), in1)
    xs2 = split_blocks(jnp.asarray(x2), in2)
    outs = [None] * len(out)
    for k, p in enumerate(paths):
        C = jnp.asarray(wigner_3j(p.ir_in1.l, p.ir_in2.l, p.ir_out.l),
                        np.float32)
        y = p.path_weight * jnp.einsum(
            "...ua,...vb,abm,uvw->...wm", xs1[p.i_in1], xs2[p.i_in2], C,
            v["params"][f"w{k}"])
        outs[p.i_out] = y if outs[p.i_out] is None else outs[p.i_out] + y
    np.testing.assert_allclose(np.asarray(fast),
                               np.asarray(merge_blocks(outs)), atol=2e-5)


def test_dimenet_triplet_chunk_matches_unchunked():
    """Round 3: InteractionPPBlock.triplet_chunk is an execution-schedule
    change only — forward and grads must match the single-pass model
    (including a chunk size that does not divide T)."""
    import jax
    import jax.numpy as jnp

    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes
    from geometric_message_passing_tpu.models import DimeNetPPModel
    from geometric_message_passing_tpu.triplets import triplet_pad_sizes

    data = ds.create_star_graphs(num=6, fold=[4, 5], dim=3, target="max",
                                 seed=2)
    loader = GraphLoader(data, batch_size=3, pad=pad_sizes(data, 3),
                         with_triplets=True,
                         triplet_pad=triplet_pad_sizes(data, 3, False))
    batch = next(iter(loader))
    T = batch.triplets.idx_kj.shape[0]

    kw = dict(num_layers=2, hidden_channels=16, int_emb_size=8,
              out_emb_channels=16, num_spherical=4, num_radial=4,
              num_output_layers=1, in_dim=1, out_dim=1)
    model = DimeNetPPModel(**kw)
    # default chunked path (round 4): basis evaluated inside the chunk body
    model_c = DimeNetPPModel(**kw, triplet_chunk=max(T // 3 - 1, 1))
    # legacy chunked path: materialized [T, ns*nr] sbf fed through the scan
    model_m = DimeNetPPModel(**kw, triplet_chunk=max(T // 3 - 1, 1),
                             sbf_in_chunk=False)
    variables = model.init(jax.random.PRNGKey(0), batch)
    vc = model_c.init(jax.random.PRNGKey(0), batch)
    assert (jax.tree_util.tree_structure(vc)
            == jax.tree_util.tree_structure(variables))

    out = np.asarray(model.apply(variables, batch))
    out_c = np.asarray(model_c.apply(variables, batch))
    np.testing.assert_allclose(out_c, out, rtol=2e-4, atol=2e-4)
    out_m = np.asarray(model_m.apply(variables, batch))
    np.testing.assert_allclose(out_m, out, rtol=2e-4, atol=2e-4)

    def loss(m):
        def f(params):
            return jnp.sum(m.apply({"params": params}, batch) ** 2)
        return f

    g = jax.grad(loss(model))(variables["params"])
    g_c = jax.grad(loss(model_c))(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3),
        g, g_c)


def test_spherenet_triplet_quad_chunk_matches_unchunked():
    """Round 4: SphereNet's box-scale strategies — triplet-chunked update_e
    (basis in-chunk) + quad-chunked torsion fold — are execution-schedule
    changes only: forward and grads must match the single-pass model
    (chunk sizes that do not divide T / Q included)."""
    import jax
    import jax.numpy as jnp

    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes
    from geometric_message_passing_tpu.models import SphereNetModel
    from geometric_message_passing_tpu.triplets import triplet_pad_sizes

    data = ds.create_star_graphs(num=6, fold=[4, 5], dim=3, target="max",
                                 seed=3)
    loader = GraphLoader(data, batch_size=3, pad=pad_sizes(data, 3),
                         with_triplets=True, with_quads=True,
                         triplet_pad=triplet_pad_sizes(data, 3, True))
    batch = next(iter(loader))
    T = batch.triplets.idx_kj.shape[0]
    Q = batch.triplets.q_trip.shape[0]

    kw = dict(num_layers=2, hidden_channels=16, int_emb_size=8,
              out_emb_channels=16, num_spherical=4, num_radial=4,
              num_output_layers=1, in_dim=1, out_dim=1)
    model = SphereNetModel(**kw)
    model_c = SphereNetModel(**kw, triplet_chunk=max(T // 3 - 1, 1),
                             quad_chunk=max(Q // 4 - 1, 1))
    variables = model.init(jax.random.PRNGKey(0), batch)
    vc = model_c.init(jax.random.PRNGKey(0), batch)
    assert (jax.tree_util.tree_structure(vc)
            == jax.tree_util.tree_structure(variables))

    out = np.asarray(model.apply(variables, batch))
    out_c = np.asarray(model_c.apply(variables, batch))
    np.testing.assert_allclose(out_c, out, rtol=2e-4, atol=2e-4)

    def loss(m):
        def f(params):
            return jnp.sum(m.apply({"params": params}, batch) ** 2)
        return f

    g = jax.grad(loss(model))(variables["params"])
    g_c = jax.grad(loss(model_c))(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3),
        g, g_c)


def test_spherenet_torsion_widekey_matches_atan2():
    """Round 5 (VERDICT item 3): the gather-cliff-aware 'widekey' torsion
    fold (packed 64-wide per-triplet table + pseudo-angle min keys,
    2.17x on-chip) must agree with the direct atan2 evaluation to float
    rounding — per-triplet torsions, model forward, and grads — chunked
    and unchunked, over batches with degenerate/pad quads."""
    import jax
    import jax.numpy as jnp

    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.graph import GraphLoader, pad_sizes
    from geometric_message_passing_tpu.models import SphereNetModel
    from geometric_message_passing_tpu.models.spherenet import (
        spherenet_geometry)
    from geometric_message_passing_tpu.triplets import triplet_pad_sizes

    data = ds.create_star_graphs(num=6, fold=[4, 5], dim=3, target="max",
                                 seed=3)
    loader = GraphLoader(data, batch_size=3, pad=pad_sizes(data, 3),
                         with_triplets=True, with_quads=True,
                         triplet_pad=triplet_pad_sizes(data, 3, True))
    batch = next(iter(loader))
    Q = batch.triplets.q_trip.shape[0]

    for chunk in (None, max(Q // 4 - 1, 1)):
        _, _, t_ref = spherenet_geometry(batch, quad_chunk=chunk,
                                         torsion_fold="atan2")
        _, _, t_new = spherenet_geometry(batch, quad_chunk=chunk,
                                         torsion_fold="widekey")
        np.testing.assert_allclose(np.asarray(t_new), np.asarray(t_ref),
                                   rtol=0, atol=5e-6)

    kw = dict(num_layers=2, hidden_channels=16, int_emb_size=8,
              out_emb_channels=16, num_spherical=4, num_radial=4,
              num_output_layers=1, in_dim=1, out_dim=1)
    m_ref = SphereNetModel(**kw, torsion_fold="atan2")
    m_new = SphereNetModel(**kw, torsion_fold="widekey")
    variables = m_ref.init(jax.random.PRNGKey(0), batch)
    out_ref = np.asarray(m_ref.apply(variables, batch))
    out_new = np.asarray(m_new.apply(variables, batch))
    np.testing.assert_allclose(out_new, out_ref, rtol=2e-4, atol=2e-4)

    def loss(m):
        def f(params):
            return jnp.sum(m.apply({"params": params}, batch) ** 2)
        return f

    g_ref = jax.grad(loss(m_ref))(variables["params"])
    g_new = jax.grad(loss(m_new))(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3),
        g_ref, g_new)


def test_dimenet_edge_chunked_matches_unchunked():
    """Round-5 100k enablers are pure schedule changes: edge_chunk (pre/
    post MLP chains + output gates in edge blocks), pad-once axes,
    rbf_in_chunk, and the packed x_kj stacks must reproduce the unchunked
    model bitwise (elementwise over rows), fwd AND grads — including
    chunk sizes that do not divide E/T."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.graph import GraphLoader
    from geometric_message_passing_tpu.models.dimenet import DimeNetPPModel

    g = ds.create_star_graphs(num=4, fold=[5, 6], dim=3, seed=0)
    b = next(iter(GraphLoader(g, batch_size=4, with_triplets=True)))
    kw = dict(num_layers=2, hidden_channels=16, int_emb_size=8,
              basis_emb_size=4, out_emb_channels=16, out_dim=1)
    m0 = DimeNetPPModel(**kw)
    v0 = m0.init(jax.random.PRNGKey(0), b)
    o0 = np.asarray(m0.apply(v0, b))
    g0 = jax.grad(lambda p: jnp.sum(m0.apply({"params": p}, b) ** 2))(
        v0["params"])
    for extra in (dict(edge_chunk=100, triplet_chunk=100),
                  dict(edge_chunk=100, triplet_chunk=100,
                       rbf_in_chunk=True),
                  dict(edge_chunk=100, triplet_chunk=100,
                       rbf_in_chunk=True, remat_blocks=True)):
        mc = DimeNetPPModel(**kw, **extra)
        vc = mc.init(jax.random.PRNGKey(0), b)
        assert (jax.tree_util.tree_structure(vc)
                == jax.tree_util.tree_structure(v0))
        oc = np.asarray(mc.apply(v0, b))
        np.testing.assert_array_equal(oc, o0, err_msg=str(extra))
        gc = jax.grad(lambda p: jnp.sum(mc.apply({"params": p}, b) ** 2))(
            v0["params"])
        jax.tree.map(lambda a, bb: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(bb), err_msg=str(extra)), g0, gc)


def test_dimenet_triplet_width_pad_matches():
    """The scatter-width-cliff fix (zero-pad the triplet pass to 64
    columns for int_emb < 64) is exact on both the chunked and the
    single-pass branch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geometric_message_passing_tpu import datasets as ds
    from geometric_message_passing_tpu.graph import GraphLoader
    from geometric_message_passing_tpu.models.dimenet import (
        InteractionPPBlock)

    g = ds.create_star_graphs(num=2, fold=[5], dim=3, seed=1)
    b = next(iter(GraphLoader(g, batch_size=2, with_triplets=True)))
    tri = b.triplets
    E = b.senders.shape[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((E, 16)), jnp.float32)
    rbf = jnp.asarray(rng.standard_normal((E, 6)), jnp.float32)
    from geometric_message_passing_tpu.ops.dimenet_basis import AngleEmb
    from geometric_message_passing_tpu.ops.norms import (safe_arctan2,
                                                         safe_norm)

    pos = b.pos
    pos_i = pos[tri.idx_i]
    pos_ji = pos[tri.idx_j] - pos_i
    pos_ki = pos[tri.idx_k] - pos_i
    a = jnp.sum(pos_ji * pos_ki, axis=-1)
    bb = safe_norm(jnp.cross(pos_ji, pos_ki), axis=-1)
    angle = safe_arctan2(bb, a)
    dist = safe_norm(pos[b.receivers] - pos[b.senders], axis=-1)
    emb = AngleEmb(7, 6, 10.0)
    sbf = emb.apply({}, dist, angle, tri.idx_kj)

    # int_emb 8 < 64 exercises the width pad on both branches
    blk_1 = InteractionPPBlock(16, 8, 4, 1, 1)
    blk_c = InteractionPPBlock(16, 8, 4, 1, 1, triplet_chunk=64)
    v = blk_1.init(jax.random.PRNGKey(0), x, rbf, sbf, tri.idx_kj,
                   tri.idx_ji, tri.t_mask)
    o1 = np.asarray(blk_1.apply(v, x, rbf, sbf, tri.idx_kj, tri.idx_ji,
                                tri.t_mask))
    oc = np.asarray(blk_c.apply(v, x, rbf, sbf, tri.idx_kj, tri.idx_ji,
                                tri.t_mask))
    assert np.all(np.isfinite(o1))
    np.testing.assert_allclose(oc, o1, rtol=2e-6, atol=2e-6)
