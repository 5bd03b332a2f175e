"""MACE block library: interaction variants run and are equivariant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import special_ortho_group

from geometric_message_passing_tpu import irreps as irr
from geometric_message_passing_tpu.irreps import Irreps
from geometric_message_passing_tpu.nn import mace_blocks as mb
from geometric_message_passing_tpu.ops.spherical import spherical_harmonics


def setup_graph(seed=0, n=6, e=20, channels=4, lmax=2, elements=3):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    one_hot = np.eye(elements, dtype=np.float32)[rng.integers(0, elements, n)]
    edge_feats = rng.normal(size=(e, 8)).astype(np.float32)
    hidden = (Irreps.spherical_harmonics(lmax) * channels).sort().simplify()
    feats = rng.normal(size=(n, hidden.dim)).astype(np.float32)
    return dict(pos=pos, senders=senders, receivers=receivers,
                one_hot=one_hot, edge_feats=edge_feats, hidden=hidden,
                feats=feats, lmax=lmax, elements=elements)


CLASSES = sorted(mb.interaction_classes)


@pytest.mark.parametrize("name", CLASSES)
def test_interaction_equivariance(name):
    g = setup_graph()
    lmax = g["lmax"]
    sh_irreps = Irreps.spherical_harmonics(lmax)
    hidden = g["hidden"]
    cls = mb.interaction_classes[name]
    block = cls(
        node_attrs_irreps=Irreps(f"{g['elements']}x0e"),
        node_feats_irreps=hidden,
        edge_attrs_irreps=sh_irreps,
        edge_feats_irreps=Irreps("8x0e"),
        target_irreps=hidden,
        hidden_irreps=hidden,
        avg_num_neighbors=3.0,
    )
    vecs = g["pos"][g["senders"]] - g["pos"][g["receivers"]]
    sh = spherical_harmonics(jnp.asarray(vecs), lmax)

    variables = block.init(
        jax.random.PRNGKey(0), jnp.asarray(g["one_hot"]),
        jnp.asarray(g["feats"]), sh, jnp.asarray(g["edge_feats"]),
        jnp.asarray(g["senders"]), jnp.asarray(g["receivers"]),
    )

    def run(feats, sh_):
        return block.apply(
            variables, jnp.asarray(g["one_hot"]), feats, sh_,
            jnp.asarray(g["edge_feats"]), jnp.asarray(g["senders"]),
            jnp.asarray(g["receivers"]),
        )

    out0 = run(jnp.asarray(g["feats"]), sh)
    R = special_ortho_group.rvs(3, random_state=7)
    D_h = irr.irreps_rep(hidden, R, 1.0).astype(np.float32)
    vecs_r = vecs @ R.T
    sh_r = spherical_harmonics(jnp.asarray(vecs_r.astype(np.float32)), lmax)
    out1 = run(jnp.asarray(g["feats"] @ D_h.T), sh_r)

    if isinstance(out0, tuple):
        msg0, sc0 = out0
        msg1, sc1 = out1
        # reshape_irreps layout [n, channels, sum_l d]; rotate blockwise
        dims = [2 * l + 1 for l in range(lmax + 1)]
        i = 0
        for l, d in enumerate(dims):
            D = irr.wigner_D_from_matrix(l, R)
            a = np.asarray(msg0)[..., i : i + d] @ D.T
            b = np.asarray(msg1)[..., i : i + d]
            assert np.allclose(a, b, atol=2e-3), (l, np.abs(a - b).max())
            i += d
        if sc0 is not None:
            D_sc = irr.irreps_rep(Irreps(g["hidden"]), R, 1.0).astype(np.float32)
            assert np.allclose(np.asarray(sc0) @ D_sc.T, np.asarray(sc1),
                               atol=2e-3)
    else:
        out_irreps = hidden  # all variants target hidden here
        D_o = irr.irreps_rep(out_irreps, R, 1.0).astype(np.float32)
        assert np.allclose(np.asarray(out0) @ D_o.T, np.asarray(out1),
                           atol=2e-3), np.abs(np.asarray(out0) @ D_o.T - np.asarray(out1)).max()


def test_readout_blocks():
    hidden = Irreps("4x0e+4x1o")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, hidden.dim)),
                    dtype=jnp.float32)
    lin = mb.LinearReadoutBlock(hidden)
    v = lin.init(jax.random.PRNGKey(0), x)
    assert lin.apply(v, x).shape == (5, 1)
    nl = mb.NonLinearReadoutBlock(hidden, Irreps("8x0e"))
    v = nl.init(jax.random.PRNGKey(0), x)
    assert nl.apply(v, x).shape == (5, 1)


def test_scale_shift_and_energies():
    blk = mb.ScaleShiftBlock(scale=2.0, shift=1.0)
    assert np.allclose(blk(jnp.asarray([1.0, 2.0])), [3.0, 5.0])
    en = mb.AtomicEnergiesBlock((1.0, -2.0))
    one_hot = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    out = en.init_with_output(jax.random.PRNGKey(0), one_hot)[0]
    assert np.allclose(out, [1.0, -2.0])
