"""EGNN with fused Pallas kernels.

Same math as models/egnn.py (verified by tests), two kernel strategies:

  * per-layer (default): each layer's gather -> message MLP -> position
    scaling -> masked segment reductions is ONE Pallas launch
    (ops/pallas_edge.py); the update MLP runs in XLA between launches.
  * whole-stack (``fuse_stack=True``): ALL layers INCLUDING the update MLPs
    run as ONE forward launch and ONE backward launch
    (ops/pallas_egnn_stack.py) — node state rides VMEM scratch across
    layers, backward rematerialises the stack in VMEM.

On this hardware the hot loop is kernel-launch-bound (~50-100us fixed cost
per kernel), so kernel count is the dominant optimization lever.

Every layer's weights live as explicit flat params (msg_*/pos_*/upd_*) so
both strategies pack them into the kernels' [P, D] row layout; the two
strategies are variable-compatible.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops.pallas_edge import (_layernorm, egnn_message_xla,
                               make_egnn_message_fused)
from ..ops.pallas_egnn_stack import make_egnn_stack_fused
from .pooling import POOL

# rows of the per-layer message/pos packing consumed by the per-layer kernel
_MSG_ROWS = lambda d: 4 * d + 12


class FusedEGNNLayer(nn.Module):
    """EGNN layer over explicit packed weights (layer norm + relu, aggr=sum
    for messages, mean for positions — the reference defaults)."""

    emb_dim: int
    use_pallas: bool = True

    def _packed(self):
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
        U1 = self.param("upd_w1", ki, (2 * d, d))
        ub1 = self.param("upd_b1", bi(2 * d), (d,))
        ug1 = self.param("upd_ln1_scale", ones, (d,))
        uB1 = self.param("upd_ln1_bias", zeros, (d,))
        U2 = self.param("upd_w2", ki, (d, d))
        ub2 = self.param("upd_b2", bi(d), (d,))
        ug2 = self.param("upd_ln2_scale", ones, (d,))
        uB2 = self.param("upd_ln2_bias", zeros, (d,))

        pb2_row = jnp.zeros((1, d), jnp.float32).at[0, 0].set(pb2[0])
        return jnp.concatenate(
            [
                W1, b1[None], g1[None], B1[None],
                W2, b2[None], g2[None], B2[None],
                P1, pb1[None], pg1[None], pB1[None],
                P2[:, 0][None], pb2_row,
                U1, ub1[None], ug1[None], uB1[None],
                U2, ub2[None], ug2[None], uB2[None],
            ],
            axis=0,
        )

    @nn.compact
    def __call__(self, h, pos, senders, receivers, edge_mask,
                 train: bool = False, packed_only: bool = False):
        d = self.emb_dim
        packed = self._packed()
        if packed_only:
            return packed

        msg_packed = packed[: _MSG_ROWS(d)]
        # The fused kernel's one-hot gather/scatter layout holds [block, N]
        # operands in VMEM — structurally a toy-regime design.  At
        # molecular-box scale (measured: 10k nodes / 129k edges) its Mosaic
        # compile crashes the remote compile helper, and the XLA path is
        # the production path anyway (scripts/bench_scale.py); dispatch on
        # size so EGNNFusedModel is safe at any scale.
        fits_vmem = h.shape[0] <= 4096
        if self.use_pallas and fits_vmem and jax.default_backend() != "cpu":
            fused = make_egnn_message_fused(d)
            msg_aggr, pos_sum, cnt = fused(
                senders, receivers, edge_mask, h, pos, msg_packed
            )
        else:
            msg_aggr, pos_sum, cnt = egnn_message_xla(
                senders, receivers, edge_mask, h, pos, msg_packed, d
            )
        pos_aggr = pos_sum / jnp.maximum(cnt, 1.0)

        # update MLP (Linear/LN/relu x2) — node-level, cheap; same packed
        # rows the stack kernel consumes
        r = _MSG_ROWS(d)
        U1 = packed[r : r + 2 * d]; r += 2 * d
        ub1, ug1, uB1 = packed[r], packed[r + 1], packed[r + 2]; r += 3
        U2 = packed[r : r + d]; r += d
        ub2, ug2, uB2 = packed[r], packed[r + 1], packed[r + 2]
        u_in = jnp.concatenate([h, msg_aggr], axis=-1)
        u = jnp.maximum(_layernorm(u_in @ U1 + ub1, ug1, uB1), 0.0)
        upd = jnp.maximum(_layernorm(u @ U2 + ub2, ug2, uB2), 0.0)
        return upd, pos + pos_aggr


class EGNNFusedModel(nn.Module):
    """EGNN model over FusedEGNNLayer (reference defaults: relu, layernorm,
    sum aggregation, residual h, non-residual pos).

    ``fuse_stack=True`` runs all message-passing layers as ONE Pallas
    forward launch + ONE backward launch (ops/pallas_egnn_stack.py);
    variables are interchangeable with the per-layer strategy."""

    num_layers: int = 5
    emb_dim: int = 128
    in_dim: int = 1
    out_dim: int = 1
    pool: str = "sum"
    residual: bool = True
    equivariant_pred: bool = False
    use_pallas: bool = True
    fuse_stack: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        h = nn.Embed(self.in_dim, self.emb_dim,
                     embedding_init=nn.initializers.normal(1.0),  # torch Embedding default
                     name="emb_in")(batch.atoms)
        pos = batch.pos
        layers = [FusedEGNNLayer(self.emb_dim, self.use_pallas,
                                 name=f"conv_{i}")
                  for i in range(self.num_layers)]
        if self.fuse_stack:
            # NOTE the stack kernel folds the residual into the layer, so it
            # implements residual=True semantics only
            assert self.residual, "fuse_stack implements residual=True"
            Wall = jnp.stack([
                layer(h, pos, batch.senders, batch.receivers,
                      batch.edge_mask, packed_only=True)
                for layer in layers
            ])
            if self.use_pallas and jax.default_backend() != "cpu":
                stack = make_egnn_stack_fused(self.emb_dim, self.num_layers,
                                              residual=True)
                h, pos = stack(batch.senders, batch.receivers,
                               batch.edge_mask, h, pos, Wall)
            else:
                from ..ops.pallas_egnn_stack import egnn_stack_xla

                h, pos = egnn_stack_xla(batch.senders, batch.receivers,
                                        batch.edge_mask, h, pos, Wall,
                                        self.num_layers, residual=True)
        else:
            for layer in layers:
                h_update, pos_update = layer(
                    h, pos, batch.senders, batch.receivers, batch.edge_mask,
                    train)
                h = h + h_update if self.residual else h_update
                pos = pos_update
        # torch-default readout inits, matching models/egnn.py::EGNNModel
        from ..nn.basic import (torch_linear_bias_init,
                                torch_linear_kernel_init)
        ki, bi = torch_linear_kernel_init, torch_linear_bias_init
        if self.equivariant_pred:
            out = POOL[self.pool](jnp.concatenate([h, pos], -1), batch)
            return nn.Dense(self.out_dim, kernel_init=ki,
                            bias_init=bi(out.shape[-1]), name="pred")(out)
        out = POOL[self.pool](h, batch)
        out = nn.Dense(self.emb_dim, kernel_init=ki,
                       bias_init=bi(self.emb_dim))(out)
        out = nn.relu(out)
        return nn.Dense(self.out_dim, kernel_init=ki,
                        bias_init=bi(self.emb_dim))(out)
