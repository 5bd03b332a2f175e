"""Direct numerical comparison against the reference implementation.

SURVEY §4's test plan calls for per-layer activation allclose vs the
reference PyTorch models.  The reference's compute stack (torch_geometric,
torch_scatter, torch_sparse, e3nn) is NOT installed in this image, so the
reference models cannot execute here — the framework's numerics are instead
pinned by property tests (equivariance, orthogonality, Wigner homomorphism,
expressivity pass/fail tables) plus parity of the training metrics against
the reference's own exp_history.json ledger (RESULTS.md).

This file covers the slice of the reference that IS runnable with plain
torch: mace_modules/radial.py (BesselBasis eq. 7, PolynomialCutoff eq. 8 —
/root/reference/models/mace_modules/radial.py:12-81), imported from the
reference tree with a no-op stub for its decorative e3nn.util.jit import.
Skips cleanly when the reference checkout is absent.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

REF_RADIAL = "/root/reference/models/mace_modules/radial.py"


def _load_reference_radial():
    """Import the reference radial module with e3nn stubbed out (its only
    e3nn use is the @compile_mode("script") class decorator)."""
    if "e3nn" not in sys.modules:
        e3nn = types.ModuleType("e3nn")
        util = types.ModuleType("e3nn.util")
        jit = types.ModuleType("e3nn.util.jit")
        jit.compile_mode = lambda mode: (lambda cls: cls)
        e3nn.util = util
        util.jit = jit
        sys.modules["e3nn"] = e3nn
        sys.modules["e3nn.util"] = util
        sys.modules["e3nn.util.jit"] = jit
    spec = importlib.util.spec_from_file_location("ref_radial", REF_RADIAL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


requires_reference = pytest.mark.skipif(
    not __import__("os").path.exists(REF_RADIAL),
    reason="reference checkout not available",
)


@requires_reference
def test_bessel_basis_matches_reference():
    import torch

    from geometric_message_passing_tpu.ops.radial import bessel_basis

    ref = _load_reference_radial()
    r_max, num_basis = 10.0, 8
    block = ref.BesselBasis(r_max=r_max, num_basis=num_basis)
    r = np.linspace(0.05, 1.3 * r_max, 197, dtype=np.float32)

    theirs = block(torch.from_numpy(r)[:, None]).detach().numpy()
    ours = np.asarray(bessel_basis(r[:, None], r_max, num_basis))
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-6)


@requires_reference
@pytest.mark.parametrize("p", [6, 5])
def test_polynomial_cutoff_matches_reference(p):
    import torch

    from geometric_message_passing_tpu.ops.radial import polynomial_cutoff

    ref = _load_reference_radial()
    r_max = 10.0
    block = ref.PolynomialCutoff(r_max=r_max, p=p)
    r = np.linspace(0.0, 1.3 * r_max, 197, dtype=np.float32)

    theirs = block(torch.from_numpy(r)[:, None])[:, 0].detach().numpy()
    ours = np.asarray(polynomial_cutoff(r[:, None], r_max, p))[:, 0]
    # atol 1e-5: f32 pow-chain rounding near the envelope's tail
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=1e-5)


@requires_reference
def test_radial_embedding_matches_reference_product():
    """RadialEmbeddingBlock (blocks.py:84-96) = BesselBasis × PolynomialCutoff;
    our radial_embedding must equal the product of the two reference blocks."""
    import torch

    from geometric_message_passing_tpu.ops.radial import radial_embedding

    ref = _load_reference_radial()
    r_max = 10.0
    bessel = ref.BesselBasis(r_max=r_max, num_basis=8)
    cutoff = ref.PolynomialCutoff(r_max=r_max, p=5)
    r = np.linspace(0.05, 1.3 * r_max, 197, dtype=np.float32)

    rt = torch.from_numpy(r)[:, None]
    theirs = (bessel(rt) * cutoff(rt)).detach().numpy()
    ours = np.asarray(radial_embedding(r[:, None], r_max))
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-6)


REF_SPHERENET = "/root/reference/models/layers/spherenet_layer.py"


def _load_reference_spherenet():
    """Import the reference spherenet_layer with its absent compiled deps
    stubbed (torch_geometric.nn.inits.glorot_orthogonal, torch_scatter,
    torch_sparse) — none of them participate in the basis modules under
    test, which are pure torch + sympy/scipy codegen."""
    for name, attrs in (
        ("torch_geometric", {}),
        ("torch_geometric.nn", {}),
        ("torch_geometric.nn.inits", {"glorot_orthogonal": lambda *a, **k: None}),
        ("torch_scatter", {"scatter": lambda *a, **k: None}),
        ("torch_sparse", {"SparseTensor": object}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    # numpy 2.0 removed the np.math alias the (older) reference uses at
    # spherenet_layer.py:295 — restore the alias, not any numeric behavior
    import math as _math

    import numpy as _np

    if not hasattr(_np, "math"):
        _np.math = _math
    spec = importlib.util.spec_from_file_location("ref_spherenet",
                                                  REF_SPHERENET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


requires_reference_spherenet = pytest.mark.skipif(
    not __import__("os").path.exists(REF_SPHERENET),
    reason="reference checkout not available",
)


@requires_reference_spherenet
class TestSphereNetBasisOracle:
    """allclose of our coefficient-table basis evaluations
    (ops/dimenet_basis.py::DistEmb/AngleEmb/TorsionEmb) against the
    reference's sympy-lambdified modules (spherenet_layer.py:394-490), at
    SphereNet's default hyperparameters.

    The reference modules are evaluated in FLOAT64: their closed-form
    spherical Bessel j_l is catastrophically cancellative in float32 at
    small x (measured up to O(1000) absolute error vs their own float64
    evaluation), so float64 is the reference's defined math; our float32
    evaluation (series/closed-form switch, see
    dimenet_basis.spherical_bessel_jl) must sit within float32 rounding of
    it — tighter than the reference's own float32 forward."""

    ns, nr, cutoff = 7, 6, 5.0

    def _data(self, seed=0, e=64, t=96):
        rng = np.random.default_rng(seed)
        dist = rng.uniform(0.05, self.cutoff * 0.99, e).astype(np.float32)
        angle = rng.uniform(0.0, np.pi, t).astype(np.float32)
        phi = rng.uniform(0.0, 2 * np.pi, t).astype(np.float32)
        idx_kj = rng.integers(0, e, t).astype(np.int64)
        return dist, angle, phi, idx_kj

    def test_dist_emb(self):
        import jax
        import torch

        from geometric_message_passing_tpu.ops.dimenet_basis import DistEmb

        ref_mod = _load_reference_spherenet()
        dist, *_ = self._data()
        ref = ref_mod.dist_emb(self.nr, self.cutoff, 5)
        with torch.no_grad():
            want = ref(torch.from_numpy(dist)).numpy()
        m = DistEmb(self.nr, self.cutoff, 5, zero_outside=False)
        got = m.apply(m.init(jax.random.PRNGKey(0), dist), dist)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)

    def test_angle_emb(self):
        import jax
        import torch

        from geometric_message_passing_tpu.ops.dimenet_basis import AngleEmb

        ref_mod = _load_reference_spherenet()
        dist, angle, _, idx_kj = self._data()
        ref = ref_mod.angle_emb(self.ns, self.nr, self.cutoff)
        with torch.no_grad():
            want = ref(torch.from_numpy(dist).double(),
                       torch.from_numpy(angle).double(),
                       torch.from_numpy(idx_kj)).numpy()
        m = AngleEmb(self.ns, self.nr, self.cutoff)
        got = m.apply(m.init(jax.random.PRNGKey(0), dist, angle, idx_kj),
                      dist, angle, idx_kj)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)

    def test_torsion_emb(self):
        import jax
        import torch

        from geometric_message_passing_tpu.ops.dimenet_basis import TorsionEmb

        ref_mod = _load_reference_spherenet()
        dist, angle, phi, idx_kj = self._data()
        ref = ref_mod.torsion_emb(self.ns, self.nr, self.cutoff)
        with torch.no_grad():
            want = ref(torch.from_numpy(dist).double(),
                       torch.from_numpy(angle).double(),
                       torch.from_numpy(phi).double(),
                       torch.from_numpy(idx_kj)).numpy()
        m = TorsionEmb(self.ns, self.nr, self.cutoff)
        got = m.apply(m.init(jax.random.PRNGKey(0), dist, angle, phi, idx_kj),
                      dist, angle, phi, idx_kj)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)
