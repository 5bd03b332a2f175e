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
/root/reference/models/mace_modules/radial.py:12-81, with a no-op stub for
its decorative e3nn.util.jit import), the SphereNet basis modules, and —
via FAITHFUL pure-torch stand-ins for torch_scatter/the PyG propagate
protocol (_install_pyg_stubs) — the reference's actual GVP perceptron /
LayerNorm / GVPConv / GVPConvLayer (gvp_layer.py) and EGNNLayer
(egnn_layer.py), each asserted activation-allclose against this
framework's layer with ported weights.  Skips cleanly when the reference
checkout is absent.
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


def _install_pyg_stubs():
    """Install FAITHFUL pure-torch stand-ins for the absent compiled deps
    (torch_scatter, torch_geometric's MessagePassing engine, torch_sparse)
    into sys.modules, so reference layer modules that only use their
    documented semantics (scatter reductions; the gather->message->
    aggregate->update propagate protocol) can execute for oracle tests.

    The scatter semantics mirror torch_scatter (sum/add; mean = sum /
    clamp(count,1)); propagate mirrors PyG flow="source_to_target"
    (edge_index[0]=source j, edge_index[1]=target i, _i/_j suffix gathers,
    aggregate over the target index, update receives named kwargs)."""
    import inspect

    import torch

    def scatter(src, index, dim=0, dim_size=None, reduce="sum"):
        assert dim == 0, dim
        n = int(dim_size) if dim_size is not None else int(index.max()) + 1
        out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
        out.index_add_(0, index, src)
        if reduce == "mean":
            cnt = torch.zeros(n, dtype=src.dtype)
            cnt.index_add_(0, index, torch.ones(index.shape[0], dtype=src.dtype))
            out = out / cnt.clamp(min=1).view(-1, *([1] * (src.dim() - 1)))
        else:
            assert reduce in ("sum", "add"), reduce
        return out

    def scatter_add(src, index, dim=0, dim_size=None):
        return scatter(src, index, dim=dim, dim_size=dim_size, reduce="sum")

    class MessagePassing(torch.nn.Module):
        node_dim = 0

        def __init__(self, aggr="add", **kwargs):
            super().__init__()
            self.aggr = aggr

        def propagate(self, edge_index, **kwargs):
            src, dst = edge_index[0], edge_index[1]

            def collect(name):
                if name.endswith("_i"):
                    return kwargs[name[:-2]][dst]
                if name.endswith("_j"):
                    return kwargs[name[:-2]][src]
                return kwargs[name]

            msg_names = list(inspect.signature(self.message).parameters)
            out = self.message(**{p: collect(p) for p in msg_names})
            first = next(iter(kwargs.values()))
            first = first[0] if isinstance(first, (tuple, list)) else first
            dim_size = first.shape[0]
            agg_names = inspect.signature(self.aggregate).parameters
            if "dim_size" in agg_names:
                out = self.aggregate(out, dst, dim_size=dim_size)
            else:
                out = self.aggregate(out, dst)
            upd_names = list(inspect.signature(self.update).parameters)
            return self.update(out, **{p: collect(p) for p in upd_names[1:]})

        def aggregate(self, inputs, index, dim_size=None):
            return scatter(inputs, index, dim=0, dim_size=dim_size,
                           reduce="mean" if self.aggr == "mean" else "sum")

        def update(self, aggr_out):
            return aggr_out

    for name, attrs in (
        ("torch_geometric", {}),
        ("torch_geometric.nn", {"MessagePassing": MessagePassing,
                                "global_add_pool": None,
                                "global_mean_pool": None}),
        ("torch_geometric.nn.inits", {"glorot_orthogonal": lambda *a, **k: None}),
        ("torch_scatter", {"scatter": scatter, "scatter_add": scatter_add,
                           "scatter_sum": scatter_add}),
        ("torch_sparse", {"SparseTensor": object}),
    ):
        mod = sys.modules.get(name)
        if mod is not None and not getattr(mod, "_gmp_stub", False):
            continue  # the REAL package is importable — never clobber it
        if mod is None:
            mod = types.ModuleType(name)
            mod._gmp_stub = True
            sys.modules[name] = mod
        for k, v in attrs.items():
            setattr(mod, k, v)


def _load_reference_spherenet():
    """Import the reference spherenet_layer with its absent compiled deps
    stubbed — none of them participate in the basis modules under test,
    which are pure torch + sympy/scipy codegen."""
    _install_pyg_stubs()
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


# ---------------------------------------------------------------------------
# Layer oracles: run the reference's ACTUAL GVP / EGNN layer code (imported
# from /root/reference with the faithful stubs above) and assert activation
# allclose against this framework's layers with ported weights — SURVEY
# §4(b)'s per-layer test, for every reference layer runnable without e3nn.
# ---------------------------------------------------------------------------

REF_GVP = "/root/reference/models/layers/gvp_layer.py"
REF_EGNN = "/root/reference/models/layers/egnn_layer.py"


def _load_reference_module(path, name):
    _install_pyg_stubs()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


requires_reference_gvp = pytest.mark.skipif(
    not __import__("os").path.exists(REF_GVP),
    reason="reference checkout not available")


def _copy_linear(tlin, fdense):
    import torch

    tlin.weight.data = torch.from_numpy(
        np.asarray(fdense["kernel"]).T.copy())
    if tlin.bias is not None:
        tlin.bias.data = torch.from_numpy(np.asarray(fdense["bias"]).copy())


def _copy_layernorm(tln, fln):
    import torch

    tln.weight.data = torch.from_numpy(np.asarray(fln["scale"]).copy())
    tln.bias.data = torch.from_numpy(np.asarray(fln["bias"]).copy())


def _copy_gvp(tgvp, fparams):
    """Port one flax nn/gvp.py::GVP's params onto a reference GVP module."""
    if hasattr(tgvp, "wh"):
        _copy_linear(tgvp.wh, fparams["wh"])
    _copy_linear(tgvp.ws, fparams["ws"])
    if hasattr(tgvp, "wv"):
        _copy_linear(tgvp.wv, fparams["wv"])
    if hasattr(tgvp, "wsv"):
        _copy_linear(tgvp.wsv, fparams["wsv"])


def _rand_tuple(rng, n, dims):
    s = rng.standard_normal((n, dims[0])).astype(np.float32)
    v = rng.standard_normal((n, dims[1], 3)).astype(np.float32)
    return s, v


@requires_reference_gvp
class TestGVPOracle:
    @pytest.mark.parametrize(
        "in_dims,out_dims,vector_gate,acts",
        [((6, 4), (5, 3), True, ("relu", "sigmoid")),
         ((6, 4), (5, 3), False, ("relu", "sigmoid")),
         ((6, 4), (5, 3), True, (None, None)),
         ((6, 0), (5, 3), True, ("relu", "sigmoid")),   # scalar-only input
         ((6, 4), (5, 0), True, ("relu", "sigmoid"))])  # scalar-only output
    def test_gvp_perceptron(self, in_dims, out_dims, vector_gate, acts):
        import jax
        import torch
        import torch.nn.functional as F

        from geometric_message_passing_tpu.nn.gvp import GVP

        ref_mod = _load_reference_module(REF_GVP, "ref_gvp")
        rng = np.random.default_rng(0)
        n = 17
        tacts = (F.relu if acts[0] == "relu" else None,
                 torch.sigmoid if acts[1] == "sigmoid" else None)
        ref = ref_mod.GVP(in_dims, out_dims, activations=tacts,
                          vector_gate=vector_gate).eval()

        ours = GVP(in_dims, out_dims, act_s=acts[0], act_v=acts[1],
                   vector_gate=vector_gate)
        if in_dims[1]:
            x = _rand_tuple(rng, n, in_dims)
            xt = (torch.from_numpy(x[0]), torch.from_numpy(x[1]))
        else:
            x = rng.standard_normal((n, in_dims[0])).astype(np.float32)
            xt = torch.from_numpy(x)
        params = ours.init(jax.random.PRNGKey(0), x)["params"]
        _copy_gvp(ref, params)
        with torch.no_grad():
            want = ref(xt)
        got = ours.apply({"params": params}, x)
        if out_dims[1]:
            np.testing.assert_allclose(np.asarray(got[0]), want[0].numpy(),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(got[1]), want[1].numpy(),
                                       rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                       rtol=1e-5, atol=1e-5)

    def test_gvp_layernorm(self):
        import jax
        import torch

        from geometric_message_passing_tpu.nn.gvp import GVPLayerNorm

        ref_mod = _load_reference_module(REF_GVP, "ref_gvp")
        rng = np.random.default_rng(1)
        dims = (7, 5)
        x = _rand_tuple(rng, 13, dims)
        ref = ref_mod.LayerNorm(dims).eval()
        ours = GVPLayerNorm(dims)
        params = ours.init(jax.random.PRNGKey(0), x)["params"]
        _copy_layernorm(ref.scalar_norm, params["LayerNorm_0"])
        with torch.no_grad():
            want = ref((torch.from_numpy(x[0]), torch.from_numpy(x[1])))
        got = ours.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got[0]), want[0].numpy(),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[1]), want[1].numpy(),
                                   rtol=1e-5, atol=1e-5)

    def _graph(self, rng, n, e):
        senders = rng.integers(0, n, e).astype(np.int32)
        receivers = (senders + 1 + rng.integers(0, n - 1, e)).astype(np.int32) % n
        return senders, receivers

    def _conv_params_to_ref(self, params, ref_conv, n_layers):
        """models/gvpgnn.py::GVPConv keeps the chain as flat per-layer params
        gvp{k}_{wh,wv,ws,bs,wsv,bsv}; port them onto ref.message_func[k]."""
        import torch

        for k in range(n_layers):
            g = ref_conv.message_func[k]
            g.wh.weight.data = torch.from_numpy(
                np.asarray(params[f"gvp{k}_wh"]).T.copy())
            g.wv.weight.data = torch.from_numpy(
                np.asarray(params[f"gvp{k}_wv"]).T.copy())
            g.ws.weight.data = torch.from_numpy(
                np.asarray(params[f"gvp{k}_ws"]).T.copy())
            g.ws.bias.data = torch.from_numpy(
                np.asarray(params[f"gvp{k}_bs"]).reshape(-1).copy())
            g.wsv.weight.data = torch.from_numpy(
                np.asarray(params[f"gvp{k}_wsv"]).T.copy())
            g.wsv.bias.data = torch.from_numpy(
                np.asarray(params[f"gvp{k}_bsv"]).reshape(-1).copy())

    def test_gvp_conv(self):
        """Our GVPConv (all-true mask AND a padded-edge variant) ==
        the reference GVPConv run through the faithful propagate stub."""
        import jax
        import torch

        from geometric_message_passing_tpu.models.gvpgnn import GVPConv

        ref_mod = _load_reference_module(REF_GVP, "ref_gvp")
        rng = np.random.default_rng(2)
        n, e = 11, 30
        node_dims, edge_dims = (8, 4), (5, 2)
        senders, receivers = self._graph(rng, n, e)
        x = _rand_tuple(rng, n, node_dims)
        ea = _rand_tuple(rng, e, edge_dims)
        mask = np.ones(e, dtype=bool)

        ours = GVPConv(node_dims, edge_dims, n_layers=3)
        variables = ours.init(jax.random.PRNGKey(0), x, senders, receivers,
                              ea, mask)
        ref = ref_mod.GVPConv(node_dims, node_dims, edge_dims,
                              n_layers=3).eval()
        self._conv_params_to_ref(variables["params"], ref, 3)
        ei = torch.from_numpy(np.stack([senders, receivers]).astype(np.int64))
        with torch.no_grad():
            want = ref((torch.from_numpy(x[0]), torch.from_numpy(x[1])), ei,
                       (torch.from_numpy(ea[0]), torch.from_numpy(ea[1])))
        got = ours.apply(variables, x, senders, receivers, ea, mask)
        np.testing.assert_allclose(np.asarray(got[0]), want[0].numpy(),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got[1]), want[1].numpy(),
                                   rtol=2e-5, atol=2e-5)

        # padded edges (mask=False) must not change the result
        pad = 9
        sp = np.concatenate([senders, np.zeros(pad, np.int32)])
        rp = np.concatenate([receivers, np.zeros(pad, np.int32)])
        eap = (np.concatenate([ea[0], np.zeros((pad, edge_dims[0]), np.float32)]),
               np.concatenate([ea[1], np.zeros((pad, edge_dims[1], 3), np.float32)]))
        mp = np.concatenate([mask, np.zeros(pad, bool)])
        got_p = ours.apply(variables, x, sp, rp, eap, mp)
        np.testing.assert_allclose(np.asarray(got_p[0]), want[0].numpy(),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_p[1]), want[1].numpy(),
                                   rtol=2e-5, atol=2e-5)

    def _layer_params_to_ref(self, params, ref_layer, n_message,
                             n_feedforward):
        self._conv_params_to_ref(params["conv"], ref_layer.conv, n_message)
        _copy_layernorm(ref_layer.norm[0].scalar_norm,
                        params["norm0"]["LayerNorm_0"])
        _copy_layernorm(ref_layer.norm[1].scalar_norm,
                        params["norm1"]["LayerNorm_0"])
        for k in range(n_feedforward):
            _copy_gvp(ref_layer.ff_func[k], params[f"ff_{k}"])

    @pytest.mark.parametrize("mode", ["plain", "autoregressive", "node_mask"])
    def test_gvp_conv_layer(self, mode):
        """Full GVPConvLayer (residual + norms + feed-forward), including the
        round-2 autoregressive decoder mode and node_mask, == the reference
        layer (gvp_layer.py:327-439) in eval mode."""
        import jax
        import torch

        from geometric_message_passing_tpu.models.gvpgnn import GVPConvLayer

        ref_mod = _load_reference_module(REF_GVP, "ref_gvp")
        rng = np.random.default_rng(3)
        n, e = 11, 30
        node_dims, edge_dims = (8, 4), (5, 2)
        senders, receivers = self._graph(rng, n, e)
        x = _rand_tuple(rng, n, node_dims)
        ea = _rand_tuple(rng, e, edge_dims)
        mask = np.ones(e, dtype=bool)
        ar = mode == "autoregressive"
        ar_x = _rand_tuple(rng, n, node_dims) if ar else None
        node_mask = (rng.random(n) < 0.6) if mode == "node_mask" else None

        ours = GVPConvLayer(node_dims, edge_dims)
        variables = ours.init(jax.random.PRNGKey(0), x, senders, receivers,
                              ea, mask, autoregressive_x=ar_x,
                              node_mask=node_mask)
        ref = ref_mod.GVPConvLayer(node_dims, edge_dims,
                                   autoregressive=ar).eval()
        self._layer_params_to_ref(variables["params"], ref, 3, 2)
        ei = torch.from_numpy(np.stack([senders, receivers]).astype(np.int64))
        xt = (torch.from_numpy(x[0].copy()), torch.from_numpy(x[1].copy()))
        with torch.no_grad():
            want = ref(xt, ei,
                       (torch.from_numpy(ea[0]), torch.from_numpy(ea[1])),
                       autoregressive_x=None if ar_x is None else
                       (torch.from_numpy(ar_x[0]), torch.from_numpy(ar_x[1])),
                       node_mask=None if node_mask is None else
                       torch.from_numpy(node_mask))
        got = ours.apply(variables, x, senders, receivers, ea, mask,
                         autoregressive_x=ar_x, node_mask=node_mask)
        np.testing.assert_allclose(np.asarray(got[0]), want[0].numpy(),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got[1]), want[1].numpy(),
                                   rtol=2e-5, atol=2e-5)


requires_reference_egnn = pytest.mark.skipif(
    not __import__("os").path.exists(REF_EGNN),
    reason="reference checkout not available")


@requires_reference_egnn
@pytest.mark.parametrize("aggr", ["add", "mean"])
def test_egnn_layer_matches_reference(aggr):
    """Our EGNNLayer == the reference EGNNLayer (egnn_layer.py:7-89) with
    ported MLP/LayerNorm weights, run through the faithful propagate stub."""
    import jax
    import torch

    from geometric_message_passing_tpu.models.egnn import EGNNLayer

    ref_mod = _load_reference_module(REF_EGNN, "ref_egnn")
    rng = np.random.default_rng(4)
    n, e, d = 13, 40, 16
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = (senders + 1 + rng.integers(0, n - 1, e)).astype(np.int32) % n
    # every node must receive >=1 edge: the reference aggregate infers
    # dim_size from index.max()+1
    receivers[:n] = np.arange(n)
    h = rng.standard_normal((n, d)).astype(np.float32)
    pos = rng.standard_normal((n, 3)).astype(np.float32)
    mask = np.ones(e, dtype=bool)

    ours = EGNNLayer(emb_dim=d, aggr=aggr)
    variables = ours.init(jax.random.PRNGKey(0), h, pos, senders, receivers,
                          mask)
    ref = ref_mod.EGNNLayer(emb_dim=d, aggr=aggr).eval()
    p = variables["params"]
    for mlp_name, seq in (("mlp_msg", ref.mlp_msg), ("mlp_pos", ref.mlp_pos),
                          ("mlp_upd", ref.mlp_upd)):
        fl = p[mlp_name]
        torch_linears = [m for m in seq if isinstance(m, torch.nn.Linear)]
        torch_lns = [m for m in seq if isinstance(m, torch.nn.LayerNorm)]
        for i, tl in enumerate(torch_linears):
            _copy_linear(tl, fl[f"Dense_{i}"])
        for i, tl in enumerate(torch_lns):
            _copy_layernorm(tl, fl[f"LayerNorm_{i}"])
    ei = torch.from_numpy(np.stack([senders, receivers]).astype(np.int64))
    with torch.no_grad():
        want_h, want_pos = ref(torch.from_numpy(h), torch.from_numpy(pos), ei)
    got_h, got_pos = ours.apply(variables, h, pos, senders, receivers, mask)
    np.testing.assert_allclose(np.asarray(got_h), want_h.numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_pos), want_pos.numpy(),
                               rtol=2e-5, atol=2e-5)


@requires_reference_spherenet
class TestSphereNetLayerOracle:
    """Activation allclose of our SphereNet init/update_e/update_v against
    the reference's ACTUAL layer modules (spherenet_layer.py:69-226),
    executed via the faithful scatter stand-in, with ported weights.
    xyz_to_dat needs real torch_sparse and is covered instead by the basis
    oracles above + model-level equivariance/anchor parity."""

    h, nr, ns = 16, 6, 3

    def _lin(self, tlin, fl):
        _copy_linear(tlin, fl)

    def test_init(self):
        import jax
        import torch

        from geometric_message_passing_tpu.models.spherenet import (
            SphereNetInit)

        ref_mod = _load_reference_spherenet()
        rng = np.random.default_rng(10)
        n, e = 9, 24
        atoms = rng.integers(0, 5, n).astype(np.int32)
        rbf = rng.standard_normal((e, self.nr)).astype(np.float32)
        recv = rng.integers(0, n, e).astype(np.int32)
        send = rng.integers(0, n, e).astype(np.int32)

        ours = SphereNetInit(self.nr, self.h)
        variables = ours.init(jax.random.PRNGKey(0), atoms, rbf, recv, send)
        p = variables["params"]
        ref = ref_mod.init(self.nr, self.h).eval()
        import math

        # ours stores the embedding as U[0, 2*sqrt(3)] and subtracts sqrt(3)
        # at call time; the reference's weight is the centered value
        ref.emb.weight.data = torch.from_numpy(
            np.asarray(p["emb"]["embedding"]) - math.sqrt(3.0))
        self._lin(ref.lin_rbf_0, p["lin_rbf_0"])
        self._lin(ref.lin, p["lin"])
        self._lin(ref.lin_rbf_1, p["lin_rbf_1"])
        with torch.no_grad():
            w1, w2 = ref(torch.from_numpy(atoms).long(),
                         (torch.from_numpy(rbf), None, None),
                         torch.from_numpy(recv).long(),
                         torch.from_numpy(send).long())
        g1, g2 = ours.apply(variables, atoms, rbf, recv, send)
        np.testing.assert_allclose(np.asarray(g1), w1.numpy(), rtol=2e-5,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(g2), w2.numpy(), rtol=2e-5,
                                   atol=2e-5)

    def test_update_e(self):
        import jax
        import torch

        from geometric_message_passing_tpu.models.spherenet import (
            SphereNetUpdateE)

        ref_mod = _load_reference_spherenet()
        rng = np.random.default_rng(11)
        e, t = 20, 50
        int_emb, bd, ba, bt = 8, 4, 4, 4
        x1 = rng.standard_normal((e, self.h)).astype(np.float32)
        e2 = rng.standard_normal((e, self.h)).astype(np.float32)
        rbf0 = rng.standard_normal((e, self.nr)).astype(np.float32)
        sbf = rng.standard_normal((t, self.ns * self.nr)).astype(np.float32)
        tor = rng.standard_normal(
            (t, self.ns * self.ns * self.nr)).astype(np.float32)
        idx_kj = rng.integers(0, e, t).astype(np.int32)
        idx_ji = rng.integers(0, e, t).astype(np.int32)
        t_mask = np.ones(t, bool)

        ours = SphereNetUpdateE(self.h, int_emb, bd, ba, bt, self.ns,
                                self.nr, num_before_skip=1, num_after_skip=2)
        variables = ours.init(jax.random.PRNGKey(0), (x1, e2),
                              (rbf0, sbf, tor), idx_kj, idx_ji, t_mask)
        p = variables["params"]
        ref = ref_mod.update_e(self.h, int_emb, bd, ba, bt, self.ns, self.nr,
                               num_before_skip=1, num_after_skip=2).eval()
        for name in ("lin_rbf1", "lin_rbf2", "lin_sbf1", "lin_sbf2",
                     "lin_t1", "lin_t2", "lin_rbf", "lin_kj", "lin_ji",
                     "lin_down", "lin_up", "lin"):
            self._lin(getattr(ref, name), p[name])
        for k, res in enumerate(ref.layers_before_skip):
            self._lin(res.lin1, p[f"res_before_{k}"]["Dense_0"])
            self._lin(res.lin2, p[f"res_before_{k}"]["Dense_1"])
        for k, res in enumerate(ref.layers_after_skip):
            self._lin(res.lin1, p[f"res_after_{k}"]["Dense_0"])
            self._lin(res.lin2, p[f"res_after_{k}"]["Dense_1"])
        with torch.no_grad():
            w1, w2 = ref((torch.from_numpy(x1), torch.from_numpy(e2)),
                         (torch.from_numpy(rbf0), torch.from_numpy(sbf),
                          torch.from_numpy(tor)),
                         torch.from_numpy(idx_kj).long(),
                         torch.from_numpy(idx_ji).long())
        g1, g2 = ours.apply(variables, (x1, e2), (rbf0, sbf, tor),
                            idx_kj, idx_ji, t_mask)
        np.testing.assert_allclose(np.asarray(g1), w1.numpy(), rtol=2e-4,
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(g2), w2.numpy(), rtol=2e-4,
                                   atol=2e-4)

    def test_update_v(self):
        import jax
        import torch

        from geometric_message_passing_tpu.models.spherenet import (
            SphereNetUpdateV)

        ref_mod = _load_reference_spherenet()
        rng = np.random.default_rng(12)
        n, e, out_emb, out = 7, 21, 12, 3
        e1 = rng.standard_normal((e, self.h)).astype(np.float32)
        e2 = rng.standard_normal((e, self.h)).astype(np.float32)
        recv = rng.integers(0, n, e).astype(np.int32)
        recv[:n] = np.arange(n)  # reference scatter infers dim_size
        mask = np.ones(e, bool)

        ours = SphereNetUpdateV(self.h, out_emb, out, num_output_layers=2)
        variables = ours.init(jax.random.PRNGKey(0), (e1, e2), recv, n, mask)
        p = variables["params"]
        ref = ref_mod.update_v(self.h, out_emb, out, num_output_layers=2,
                               act=ref_mod.swish,
                               output_init="GlorotOrthogonal").eval()
        self._lin(ref.lin_up, p["lin_up"])
        for k, lin in enumerate(ref.lins):
            self._lin(lin, p[f"lin_{k}"])
        self._lin(ref.lin, p["lin"])
        with torch.no_grad():
            want = ref((torch.from_numpy(e1), torch.from_numpy(e2)),
                       torch.from_numpy(recv).long())
        got = ours.apply(variables, (e1, e2), recv, n, mask)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-5,
                                   atol=2e-5)


@requires_reference_egnn
def test_mpnn_layer_matches_reference():
    """Our MPNNLayer == the reference MPNNLayer (egnn_layer.py:92-155), the
    positions-blind baseline, with ported MLP weights."""
    import jax
    import torch

    from geometric_message_passing_tpu.models.egnn import MPNNLayer

    ref_mod = _load_reference_module(REF_EGNN, "ref_egnn")
    rng = np.random.default_rng(5)
    n, e, d = 11, 34, 16
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = (senders + 1 + rng.integers(0, n - 1, e)).astype(np.int32) % n
    receivers[:n] = np.arange(n)  # dim_size inference (see EGNN oracle)
    h = rng.standard_normal((n, d)).astype(np.float32)
    mask = np.ones(e, dtype=bool)

    ours = MPNNLayer(emb_dim=d)
    variables = ours.init(jax.random.PRNGKey(0), h, senders, receivers, mask)
    ref = ref_mod.MPNNLayer(emb_dim=d).eval()
    p = variables["params"]
    for mlp_name, seq in (("mlp_msg", ref.mlp_msg), ("mlp_upd", ref.mlp_upd)):
        fl = p[mlp_name]
        lins = [m for m in seq if isinstance(m, torch.nn.Linear)]
        lns = [m for m in seq if isinstance(m, torch.nn.LayerNorm)]
        for i, tl in enumerate(lins):
            _copy_linear(tl, fl[f"Dense_{i}"])
        for i, tl in enumerate(lns):
            _copy_layernorm(tl, fl[f"LayerNorm_{i}"])
    ei = torch.from_numpy(np.stack([senders, receivers]).astype(np.int64))
    with torch.no_grad():
        want = ref(torch.from_numpy(h), ei)
    got = ours.apply(variables, h, senders, receivers, mask)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-5,
                               atol=2e-5)
