"""EGNN with the fused Pallas message kernel.

Same math as models/egnn.py (verified by tests), but the per-layer
gather -> message MLP -> position scaling -> masked segment reductions run as
ONE Pallas kernel launch (ops/pallas_edge.py).  On this hardware the hot loop
is kernel-launch-bound (~50-100us fixed cost per kernel), so collapsing ~8
kernels per layer into 1 is the dominant optimization lever.

Backward runs through the XLA twin via custom_vjp (identical math).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphBatch
from ..ops.pallas_edge import egnn_message_xla, make_egnn_message_fused
from .pooling import POOL


class FusedEGNNLayer(nn.Module):
    """EGNN layer over explicit packed weights (layer norm + relu, aggr=sum
    for messages, mean for positions — the reference defaults)."""

    emb_dim: int
    use_pallas: bool = True

    @nn.compact
    def __call__(self, h, pos, senders, receivers, edge_mask,
                 train: bool = False):
        d = self.emb_dim
        zeros, ones = nn.initializers.zeros, nn.initializers.ones
        # torch.nn.Linear default inits, matching models/egnn.py::EGNNLayer
        from ..nn.basic import (torch_linear_bias_init,
                                torch_linear_kernel_init)
        ki = torch_linear_kernel_init
        bi = torch_linear_bias_init
        W1 = self.param("msg_w1", ki, (2 * d + 1, d))
        b1 = self.param("msg_b1", bi(2 * d + 1), (d,))
        g1 = self.param("msg_ln1_scale", ones, (d,))
        B1 = self.param("msg_ln1_bias", zeros, (d,))
        W2 = self.param("msg_w2", ki, (d, d))
        b2 = self.param("msg_b2", bi(d), (d,))
        g2 = self.param("msg_ln2_scale", ones, (d,))
        B2 = self.param("msg_ln2_bias", zeros, (d,))
        P1 = self.param("pos_w1", ki, (d, d))
        pb1 = self.param("pos_b1", bi(d), (d,))
        pg1 = self.param("pos_ln1_scale", ones, (d,))
        pB1 = self.param("pos_ln1_bias", zeros, (d,))
        P2 = self.param("pos_w2", ki, (d, 1))
        pb2 = self.param("pos_b2", bi(d), (1,))

        pb2_row = jnp.zeros((1, d), jnp.float32).at[0, 0].set(pb2[0])
        packed = jnp.concatenate(
            [
                W1, b1[None], g1[None], B1[None],
                W2, b2[None], g2[None], B2[None],
                P1, pb1[None], pg1[None], pB1[None],
                P2[:, 0][None], pb2_row,
            ],
            axis=0,
        )
        if self.use_pallas and jax.default_backend() != "cpu":
            fused = make_egnn_message_fused(d)
            msg_aggr, pos_sum, cnt = fused(
                senders, receivers, edge_mask, h, pos, packed
            )
        else:
            msg_aggr, pos_sum, cnt = egnn_message_xla(
                senders, receivers, edge_mask, h, pos, packed, d
            )
        pos_aggr = pos_sum / jnp.maximum(cnt, 1.0)

        # update MLP (Linear/LN/relu x2) — node-level, cheap
        from ..nn.basic import MLP

        upd = MLP((d, d), "relu", "layer", name="mlp_upd")(
            jnp.concatenate([h, msg_aggr], axis=-1), train=train
        )
        return upd, pos + pos_aggr


class EGNNFusedModel(nn.Module):
    """EGNN model over FusedEGNNLayer (reference defaults: relu, layernorm,
    sum aggregation, residual h, non-residual pos)."""

    num_layers: int = 5
    emb_dim: int = 128
    in_dim: int = 1
    out_dim: int = 1
    pool: str = "sum"
    residual: bool = True
    equivariant_pred: bool = False
    use_pallas: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        h = nn.Embed(self.in_dim, self.emb_dim,
                     embedding_init=nn.initializers.normal(1.0),  # torch Embedding default
                     name="emb_in")(batch.atoms)
        pos = batch.pos
        for i in range(self.num_layers):
            h_update, pos_update = FusedEGNNLayer(
                self.emb_dim, self.use_pallas, name=f"conv_{i}",
            )(h, pos, batch.senders, batch.receivers, batch.edge_mask, train)
            h = h + h_update if self.residual else h_update
            pos = pos_update
        if self.equivariant_pred:
            out = POOL[self.pool](jnp.concatenate([h, pos], -1), batch)
            return nn.Dense(self.out_dim, name="pred")(out)
        out = POOL[self.pool](h, batch)
        out = nn.Dense(self.emb_dim)(out)
        out = nn.relu(out)
        return nn.Dense(self.out_dim)(out)
