"""Incompleteness counterexample environments (Pozdnyakov et al.) —
behavioral pass/fail table from incompleteness.ipynb cells 3-13 / BASELINE.md:

  * 2-body env: distance-only models (SchNet) fail; models with access to
    directions/angles succeed.
  * 3-body env: distance+angle descriptors fail; higher body-order
    (MACE correlation >= 3) or stacked equivariant layers succeed.
  * chiral 4-body env: requires both parities in the hidden irreps.

Each test trains a 1-layer model on the 2-graph dataset (train = test,
following the reference protocol where success == memorization is possible
only if the representation separates the pair).
"""

import numpy as np
import pytest

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.experiments import fit_classification
from geometric_message_passing_tpu.experiments.train import seed_everything
from geometric_message_passing_tpu.graph import GraphLoader
from geometric_message_passing_tpu.models import (
    EGNNModel,
    MACEModel,
    SchNetModel,
)


def train_acc(model, data, n_epochs=200, lr=1e-3, seed=0):
    loader = GraphLoader(data, batch_size=2, y_dtype=np.int32)
    variables = model.init(seed_everything(seed), next(iter(loader)))
    res = fit_classification(model, variables, loader, loader, loader,
                             n_epochs=n_epochs, lr=lr, seed=seed)
    return res.test


class TestTwoBody:
    def test_schnet_fails(self):
        data = ds.create_two_body_envs()
        acc = train_acc(
            SchNetModel(num_layers=1, hidden_channels=32, in_dim=1, out_dim=2),
            data,
        )
        assert acc <= 50.0, acc

    def test_egnn_equivariant_passes(self):
        data = ds.create_two_body_envs()
        acc = train_acc(
            EGNNModel(num_layers=1, emb_dim=32, in_dim=1, out_dim=2,
                      equivariant_pred=True, pool="sum"),
            data,
        )
        assert acc == 100.0, acc


class TestThreeBody:
    def test_mace_low_correlation_scalars_fail(self):
        """correlation=1 MACE scalar readout ~ distance+angle only."""
        data = ds.create_three_body_envs()
        acc = train_acc(
            MACEModel(num_layers=1, emb_dim=8, max_ell=2, correlation=1,
                      mlp_dim=32, in_dim=1, out_dim=2, pool="sum"),
            data,
        )
        assert acc <= 50.0, acc

    def test_mace_correlation3_passes(self):
        data = ds.create_three_body_envs()
        acc = train_acc(
            MACEModel(num_layers=1, emb_dim=8, max_ell=3, correlation=3,
                      mlp_dim=32, in_dim=1, out_dim=2, pool="sum"),
            data,
        )
        assert acc == 100.0, acc


def _rotated_copies(data, n_copies=8, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_copies):
        R = ds.rand_rotation(rng)
        for g in data:
            out.append(
                type(g)(g.atoms, g.edge_index, g.pos @ R.T, g.y)
            )
    return out


class TestChiral:
    """Chirality analysis.

    FINDING (documented in datasets.create_true_chiral_envs): the reference's
    four_body_chiral pair is NOT chiral — env0 has an internal x-mirror
    symmetry, so its y-mirror (env1) equals R_z(pi) @ env0.  No
    rotation-invariant model can separate the pair; the notebook protocol can
    only be "passed" by rotation-non-invariant memorization of the fixed
    inputs.  We therefore (a) verify the rotation-equivalence, (b) replicate
    the memorization behavior, and (c) test genuine chirality detection on a
    truly chiral pair at the REPRESENTATION level: a both-parity MACE exposes
    a pseudoscalar (0o) channel that is rotation-invariant and sign-flips
    under mirroring, while single-parity scalar channels are blind to it.
    """

    def test_reference_chiral_envs_are_rotation_equivalent(self):
        env0, env1 = ds.create_four_body_chiral_envs()
        Rz = np.diag([-1.0, -1.0, 1.0])  # rotation by pi about z
        rotated = env0.pos @ Rz.T
        # same point multiset (nodes 1 and 3 swap)
        perm = [0, 3, 2, 1, 4]
        assert np.allclose(rotated[perm], env1.pos, atol=1e-6)

    def test_fixed_pair_memorizable_with_equivariant_head(self):
        """Replicates the notebook's effective outcome: on the FIXED pair, a
        rotation-non-invariant readout separates them (any parity)."""
        data = ds.create_four_body_chiral_envs()
        acc = train_acc(
            MACEModel(num_layers=1, emb_dim=8, max_ell=2, correlation=3,
                      mlp_dim=32, in_dim=1, out_dim=2, pool="sum",
                      equivariant_pred=True),
            data,
        )
        assert acc == 100.0, acc

    def test_invariant_readout_cannot_separate(self):
        """With the invariant scalar readout the (rotation-equivalent) pair
        is inseparable, both parities or not."""
        data = ds.create_four_body_chiral_envs()
        acc = train_acc(
            MACEModel(num_layers=1, emb_dim=8, max_ell=2, correlation=3,
                      mlp_dim=32, in_dim=1, out_dim=2, pool="sum",
                      hidden_irreps="8x0e+8x0o+8x1o+8x2e"),
            data,
        )
        assert acc <= 50.0, acc

    def _pooled_features(self, hidden, graphs, rotate_seed=None):
        import jax

        from geometric_message_passing_tpu.experiments.train import (
            seed_everything,
        )
        from geometric_message_passing_tpu.models.pooling import (
            global_add_pool,
        )

        if rotate_seed is not None:
            graphs = _rotated_copies(graphs, n_copies=1, seed=rotate_seed)
        loader = GraphLoader(graphs, batch_size=2, y_dtype=np.int32)
        b = next(iter(loader))
        model = MACEModel(num_layers=2, emb_dim=8, max_ell=2, correlation=3,
                          mlp_dim=32, in_dim=1, out_dim=2, pool="sum",
                          equivariant_pred=True, hidden_irreps=hidden)
        variables = model.init(seed_everything(1), b)
        _, state = model.apply(variables, b, capture_intermediates=True,
                               mutable=["intermediates"])
        h = state["intermediates"]["prod_1"]["__call__"][0]
        return np.asarray(global_add_pool(h, b))[:2]

    def test_pseudoscalar_detects_true_chirality(self):
        """Both-parity 2-layer MACE: pooled 0o channels are (i) nonzero,
        (ii) opposite-sign between mirror images, (iii) rotation-invariant.
        (Two layers are required: the symmetric contraction powers the SAME
        channel vector, so eps(x,x,x)=0 kills layer-1 pseudoscalars; layer-2
        products of 1e = h(1o) x Y(1o) with 1o produce genuine 0o.)"""
        hidden = "8x0e+8x0o+8x1e+8x1o+8x2e+8x2o"
        data = ds.create_true_chiral_envs()
        pooled = self._pooled_features(hidden, data)
        o = pooled[:, 8:16]  # 0o block
        scale = np.abs(o).max()
        assert scale > 0
        assert np.allclose(o[0], -o[1], rtol=1e-3), (o[0], o[1])
        pooled_r = self._pooled_features(hidden, data, rotate_seed=5)
        assert np.allclose(pooled_r[:, 8:16], o, rtol=1e-2, atol=scale * 1e-3)

    def test_single_parity_blind_to_chirality(self):
        """Single-parity (SH parities) invariant channels are identical for
        the mirror pair."""
        data = ds.create_true_chiral_envs()
        pooled = self._pooled_features(None, data)
        scalars = pooled[:, :8]  # 0e block of default hidden
        assert np.allclose(scalars[0], scalars[1], rtol=1e-4)
