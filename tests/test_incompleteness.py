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


class TestChiral:
    def test_single_parity_fails(self):
        """Default hidden irreps (0e+1o+2e+3o) see the mirror pair as equal
        with an invariant readout."""
        data = ds.create_four_body_chiral_envs()
        acc = train_acc(
            MACEModel(num_layers=1, emb_dim=8, max_ell=3, correlation=3,
                      mlp_dim=32, in_dim=1, out_dim=2, pool="sum"),
            data,
        )
        assert acc <= 50.0, acc

    def test_both_parities_pass(self):
        """Explicit both-parity hidden irreps (incompleteness.ipynb cell 13)."""
        data = ds.create_four_body_chiral_envs()
        acc = train_acc(
            MACEModel(num_layers=1, emb_dim=8, max_ell=3, correlation=3,
                      mlp_dim=32, in_dim=1, out_dim=2, pool="sum",
                      hidden_irreps="8x0e+8x0o+8x1e+8x1o+8x2e+8x2o+8x3e+8x3o"),
            data,
        )
        assert acc == 100.0, acc
