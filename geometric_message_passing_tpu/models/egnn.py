"""E(n)-equivariant GNN (EGNN, Satorras et al.) and the plain MPNN baseline.

TPU-native redesign of /root/reference/models/egnn.py:8-87 and
/root/reference/models/layers/egnn_layer.py:7-155: pure-function message
passing over padded static-shape batches; gather -> edge MLP -> masked
segment reduction, all fused by XLA (hot path also available as a Pallas
kernel, see ops/pallas_edge.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..graph import GraphBatch
from ..nn.basic import (ACT, MLP, torch_linear_bias_init,
                        torch_linear_kernel_init)
from ..ops.scatter import segment_max, segment_mean, segment_sum
from .pooling import POOL
from ..ops.norms import safe_norm


_AGGR = {"sum": segment_sum, "add": segment_sum, "mean": segment_mean,
         "max": segment_max}


class EGNNLayer(nn.Module):
    """One EGNN message-passing layer (egnn_layer.py:7-89).

    message: m_ij = MLP([h_i, h_j, ||x_i - x_j||]);  pos message:
    (x_i - x_j) * MLP_pos(m_ij).  Aggregation: ``aggr`` for m, mean for pos.
    update: h' = MLP([h, m_agg]); x' = x + pos_agg.
    """

    emb_dim: int
    activation: str = "relu"
    norm: str = "layer"
    aggr: str = "add"

    def setup(self):
        # attribute names fix the param-tree keys (mlp_msg/mlp_pos/mlp_upd —
        # identical to the earlier inline-named modules)
        # torch_init: the reference builds these with raw torch.nn.Linear
        # (egnn_layer.py:28-48) and never re-initializes them
        self.mlp_msg = MLP((self.emb_dim, self.emb_dim), self.activation,
                           self.norm, torch_init=True)
        # NOTE: mlp_pos in the reference is Linear/Norm/Act/Linear (egnn_layer.py:37-39)
        self.mlp_pos = MLP((self.emb_dim, 1), self.activation, self.norm,
                           norm_final=False, act_final=False, torch_init=True)
        self.mlp_upd = MLP((self.emb_dim, self.emb_dim), self.activation,
                           self.norm, torch_init=True)

    def message(self, h_i, h_j, dists, train: bool = False):
        """Edge message (msg, pos scale) from gathered endpoint features —
        exposed as a method so edge-partitioned execution
        (parallel/halo.py::gp_egnn_layer) can run it over exchanged halos."""
        msg = self.mlp_msg(jnp.concatenate([h_i, h_j, dists], -1), train=train)
        scale = self.mlp_pos(msg, train=train)
        return msg, scale

    def update(self, h, msg_aggr, train: bool = False):
        return self.mlp_upd(jnp.concatenate([h, msg_aggr], -1), train=train)

    def __call__(self, h, pos, senders, receivers, edge_mask,
                 train: bool = False, seg_plans=None):
        num_nodes = h.shape[0]
        if seg_plans is not None:
            # Molecular-box scale path (>=~64k nodes, receiver-sorted edge
            # list): every gather's backward and every segment reduction
            # runs the tiled sorted-segment Pallas kernel instead of an XLA
            # scatter-add — measured 1.6x per op at 100k/128 and exact to
            # f32 reorder level (scripts/trial_sorted_segsum.py).
            from ..ops.pallas_sorted_segsum import (sorted_gather,
                                                    sorted_segment_sum)

            (r_perm, r_starts, r_local, r_cfg) = seg_plans["rcv"]
            (s_perm, s_starts, s_local, s_cfg) = seg_plans["snd"]
            g_r = lambda x: sorted_gather(x, receivers, r_perm, r_starts,
                                          r_local, edge_mask, r_cfg)
            g_s = lambda x: sorted_gather(x, senders, s_perm, s_starts,
                                          s_local, edge_mask, s_cfg)
            h_i, h_j = g_r(h), g_s(h)
            pos_diff = g_r(pos) - g_s(pos)
            dists = safe_norm(pos_diff, axis=-1, keepdims=True)
            msg, scale = self.message(h_i, h_j, dists, train=train)
            pos_msg = pos_diff * scale
            if self.aggr not in ("sum", "add"):
                raise ValueError(
                    f"seg_plans (the sorted-segment Pallas path) only "
                    f"supports aggr='sum'/'add', got {self.aggr!r}; drop "
                    f"seg_plans to use the XLA path with this aggregation")
            red = lambda x: sorted_segment_sum(
                x, r_perm, r_starts, r_local, receivers, edge_mask, r_cfg)
            msg_aggr = red(msg)
            pc = red(jnp.concatenate(
                [pos_msg, jnp.ones_like(scale)], axis=-1))
            pos_aggr = pc[:, :3] / jnp.maximum(pc[:, 3:], 1)
            upd = self.update(h, msg_aggr, train=train)
            return upd, pos + pos_aggr
        h_i, h_j = h[receivers], h[senders]           # i = target, j = source
        pos_diff = pos[receivers] - pos[senders]
        dists = safe_norm(pos_diff, axis=-1, keepdims=True)
        msg, scale = self.message(h_i, h_j, dists, train=train)
        pos_msg = pos_diff * scale
        msg_aggr = _AGGR[self.aggr](msg, receivers, num_nodes, mask=edge_mask)
        pos_aggr = segment_mean(pos_msg, receivers, num_nodes, mask=edge_mask)
        upd = self.update(h, msg_aggr, train=train)
        return upd, pos + pos_aggr


class EGNNModel(nn.Module):
    """EGNN with the reference constructor surface (egnn.py:12-38)."""

    num_layers: int = 5
    emb_dim: int = 128
    in_dim: int = 1
    out_dim: int = 1
    activation: str = "relu"
    norm: str = "layer"
    aggr: str = "sum"
    pool: str = "sum"
    residual: bool = True
    equivariant_pred: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False,
                 seg_plans=None):
        """``seg_plans``: optional {'rcv': (perm, starts, local, cfg),
        'snd': ...} sorted-segment tile plans (ops/pallas_sorted_segsum) —
        the box-scale gather/scatter path; see EGNNLayer."""
        h = nn.Embed(self.in_dim, self.emb_dim,
                     embedding_init=nn.initializers.normal(1.0),  # torch Embedding default
                     name="emb_in")(batch.atoms)
        pos = batch.pos
        for i in range(self.num_layers):
            h_update, pos_update = EGNNLayer(
                self.emb_dim, self.activation, self.norm, self.aggr,
                name=f"conv_{i}",
            )(h, pos, batch.senders, batch.receivers, batch.edge_mask, train,
              seg_plans=seg_plans)
            h = h + h_update if self.residual else h_update
            pos = pos_update  # non-residual position update (egnn.py:79)
        if self.equivariant_pred:
            out = POOL[self.pool](jnp.concatenate([h, pos], -1), batch)
            return nn.Dense(
                self.out_dim, kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(out.shape[-1]),
                name="pred")(out)
        out = POOL[self.pool](h, batch)
        out = nn.Dense(self.emb_dim, kernel_init=torch_linear_kernel_init,
                       bias_init=torch_linear_bias_init(self.emb_dim))(out)
        out = nn.relu(out)
        return nn.Dense(self.out_dim, kernel_init=torch_linear_kernel_init,
                        bias_init=torch_linear_bias_init(self.emb_dim))(out)


class MPNNLayer(nn.Module):
    """Non-geometric MPNN baseline layer (egnn_layer.py:92-155)."""

    emb_dim: int
    activation: str = "relu"
    norm: str = "layer"
    aggr: str = "add"

    @nn.compact
    def __call__(self, h, senders, receivers, edge_mask, train: bool = False):
        num_nodes = h.shape[0]
        msg = MLP((self.emb_dim, self.emb_dim), self.activation, self.norm,
                  torch_init=True, name="mlp_msg")(
            jnp.concatenate([h[receivers], h[senders]], -1), train=train
        )
        msg_aggr = _AGGR[self.aggr](msg, receivers, num_nodes, mask=edge_mask)
        return MLP((self.emb_dim, self.emb_dim), self.activation, self.norm,
                   torch_init=True,
                   name="mlp_upd")(jnp.concatenate([h, msg_aggr], -1), train=train)


class MPNNModel(nn.Module):
    """Positions-blind MPNN (geometric_gnn_101.ipynb cell 25 baseline)."""

    num_layers: int = 4
    emb_dim: int = 64
    in_dim: int = 1
    out_dim: int = 1
    activation: str = "relu"
    norm: str = "layer"
    aggr: str = "sum"
    pool: str = "sum"
    residual: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        h = nn.Embed(self.in_dim, self.emb_dim,
                     embedding_init=nn.initializers.normal(1.0),  # torch Embedding default
                     name="emb_in")(batch.atoms)
        for i in range(self.num_layers):
            h_update = MPNNLayer(
                self.emb_dim, self.activation, self.norm, self.aggr,
                name=f"conv_{i}",
            )(h, batch.senders, batch.receivers, batch.edge_mask, train)
            h = h + h_update if self.residual else h_update
        out = POOL[self.pool](h, batch)
        out = nn.Dense(self.emb_dim, kernel_init=torch_linear_kernel_init,
                       bias_init=torch_linear_bias_init(self.emb_dim))(out)
        out = nn.relu(out)
        return nn.Dense(self.out_dim, kernel_init=torch_linear_kernel_init,
                        bias_init=torch_linear_bias_init(self.emb_dim))(out)
