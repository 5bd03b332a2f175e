"""Ops layer: segment reductions, radial bases, spherical harmonics."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import special_ortho_group

from geometric_message_passing_tpu import irreps as ir
from geometric_message_passing_tpu.ops import (
    bessel_basis,
    gaussian_smearing,
    polynomial_cutoff,
    segment_max,
    segment_mean,
    segment_sum,
    spherical_harmonics,
)


class TestScatter:
    def test_sum_mean_max(self):
        data = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
        seg = jnp.asarray([0, 0, 1, 1, 3, 3])
        s = segment_sum(data, seg, 4)
        assert np.allclose(s[0], [2, 4]) and np.allclose(s[2], 0)
        m = segment_mean(data, seg, 4)
        assert np.allclose(m[0], [1, 2]) and np.allclose(m[2], 0)
        mx = segment_max(data, seg, 4)
        assert np.allclose(mx[1], [6, 7]) and np.allclose(mx[2], 0)

    def test_mask(self):
        data = jnp.ones((4, 3))
        seg = jnp.asarray([0, 0, 1, 1])
        mask = jnp.asarray([True, False, True, True])
        assert np.allclose(segment_sum(data, seg, 2, mask)[0], 1)
        assert np.allclose(segment_mean(data, seg, 2, mask)[1], 1)


class TestRadial:
    def test_bessel_values(self):
        r = jnp.asarray([[1.0], [2.0]])
        out = bessel_basis(r, r_max=10.0, num_basis=8)
        # closed form check at n=1, r=1
        expected = np.sqrt(2 / 10.0) * np.sin(np.pi / 10.0) / 1.0
        assert np.isclose(out[0, 0], expected, rtol=1e-5)
        assert out.shape == (2, 8)

    def test_cutoff_support(self):
        r = jnp.asarray([[0.0], [5.0], [9.99], [10.01]])
        c = polynomial_cutoff(r, 10.0, p=5)
        assert np.isclose(c[0, 0], 1.0)
        assert c[3, 0] == 0.0
        assert 0 < c[1, 0] < 1

    def test_gaussian_shape(self):
        out = gaussian_smearing(jnp.asarray([0.5, 1.0]), 0.0, 10.0, 50)
        assert out.shape == (2, 50)


class TestSphericalHarmonics:
    @pytest.mark.parametrize("lmax", [1, 2, 3, 4])
    def test_component_norm(self, lmax):
        rng = np.random.default_rng(0)
        v = rng.normal(size=(32, 3)).astype(np.float32)
        sh = np.asarray(spherical_harmonics(jnp.asarray(v), lmax))
        i = 0
        for l in range(lmax + 1):
            d = 2 * l + 1
            norms = np.linalg.norm(sh[:, i : i + d], axis=1)
            assert np.allclose(norms, np.sqrt(d), atol=1e-4), l
            i += d

    @pytest.mark.parametrize("lmax", [2, 3])
    def test_equivariance(self, lmax):
        rng = np.random.default_rng(1)
        v = rng.normal(size=(16, 3))
        R = special_ortho_group.rvs(3, random_state=9)
        sh = np.asarray(spherical_harmonics(jnp.asarray(v), lmax))
        sh_rot = np.asarray(spherical_harmonics(jnp.asarray(v @ R.T), lmax))
        i = 0
        for l in range(lmax + 1):
            d = 2 * l + 1
            D = ir.wigner_D_from_matrix(l, R)
            assert np.allclose(sh_rot[:, i : i + d], sh[:, i : i + d] @ D.T,
                               atol=1e-4), l
            i += d

    def test_parity(self):
        rng = np.random.default_rng(2)
        v = rng.normal(size=(8, 3))
        sh_p = np.asarray(spherical_harmonics(jnp.asarray(v), 3))
        sh_m = np.asarray(spherical_harmonics(jnp.asarray(-v), 3))
        i = 0
        for l in range(4):
            d = 2 * l + 1
            assert np.allclose(sh_m[:, i : i + d], (-1) ** l * sh_p[:, i : i + d],
                               atol=1e-5)
            i += d

    def test_zero_vector_inert(self):
        v = jnp.zeros((2, 3))
        sh = np.asarray(spherical_harmonics(v, 2))
        assert np.allclose(sh[:, 1:], 0.0)
        assert np.allclose(sh[:, 0], 1.0)


class TestRadiusGraph:
    def test_matches_naive_pairwise(self):
        from geometric_message_passing_tpu.ops.radius_graph import radius_graph

        rng = np.random.default_rng(0)
        pos = rng.normal(size=(60, 3)) * 2.0
        batch = np.repeat(np.arange(3), 20)
        r = 1.5
        ei = radius_graph(pos, r, batch=batch)
        got = set(zip(ei[0].tolist(), ei[1].tolist()))
        want = set()
        for i in range(60):
            for j in range(60):
                if i == j or batch[i] != batch[j]:
                    continue
                if np.sum((pos[i] - pos[j]) ** 2) <= r * r:
                    want.add((i, j))
        assert got == want

    def test_max_num_neighbors(self):
        from geometric_message_passing_tpu.ops.radius_graph import radius_graph

        rng = np.random.default_rng(1)
        pos = rng.normal(size=(40, 3))
        ei = radius_graph(pos, 10.0, max_num_neighbors=5)
        counts = np.bincount(ei[0], minlength=40)
        assert counts.max() <= 5
        # kept neighbors are the nearest ones
        i = 0
        nbrs = ei[1][ei[0] == i]
        d = np.linalg.norm(pos - pos[i], axis=1)
        d[i] = np.inf
        nearest5 = set(np.argsort(d)[:5].tolist())
        assert set(nbrs.tolist()) == nearest5


class TestRoofline:
    """utils/roofline.py: XLA cost counters + roofline arithmetic."""

    def test_matmul_counters(self):
        import jax.numpy as jnp

        from geometric_message_passing_tpu.utils.roofline import roofline

        n = 256
        a = jnp.ones((n, n), jnp.float32)

        r = roofline(lambda x: x @ x, a, step_time_s=1e-3)
        # XLA counts 2*n^3 flops for an n^3 matmul
        assert abs(r.flops - 2 * n**3) / (2 * n**3) < 0.01
        assert r.bytes_accessed >= 3 * n * n * 4 * 0.99
        assert r.intensity > 1
        assert r.achieved_tflops == r.flops / 1e-3
        row = r.row()
        assert row["static_bound"] in ("compute", "memory")
        assert row["frac_of_roof"] > 0

    def test_model_step_counters(self):
        import jax

        from geometric_message_passing_tpu import datasets as ds
        from geometric_message_passing_tpu.graph import GraphLoader
        from geometric_message_passing_tpu.models import EGNNModel
        from geometric_message_passing_tpu.utils.roofline import roofline

        graphs = ds.create_star_graphs(num=4, fold=[4], dim=3, seed=0)
        batch = next(iter(GraphLoader(graphs, batch_size=4)))
        model = EGNNModel(num_layers=2, emb_dim=16, in_dim=1, out_dim=1)
        variables = model.init(jax.random.PRNGKey(0), batch)
        r = roofline(lambda v, b: model.apply(v, b), variables, batch)
        assert r.flops > 1e5 and r.bytes_accessed > 1e4
