"""SchNet (Schütt et al.) — invariant continuous-filter convolutions.

TPU-native redesign of /root/reference/models/schnet.py:9-80, which wraps PyG
``SchNet`` internals (GaussianSmearing, CFConv interaction blocks,
ShiftedSoftplus): here those internals are first-class jnp code so the whole
edge path fuses into one XLA program.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops.radial import gaussian_smearing
from ..ops.scatter import segment_sum
from .pooling import POOL
from ..ops.norms import safe_norm


def shifted_softplus(x):
    return nn.softplus(x) - math.log(2.0)


class SchNetInteraction(nn.Module):
    """CFConv + filter MLP + output transform (PyG InteractionBlock numerics:
    filter W = MLP(edge_attr) * cosine_cutoff; message x_j * W; sum to target;
    lin2; ssp; lin)."""

    hidden_channels: int
    num_filters: int
    cutoff: float

    @nn.compact
    def __call__(self, h, senders, receivers, edge_weight, edge_attr,
                 edge_mask, seg_plans=None):
        # PyG InteractionBlock/CFConv.reset_parameters: xavier_uniform on
        # every Linear, zero biases (the flax default)
        xavier = nn.initializers.xavier_uniform()
        num_nodes = h.shape[0]
        W = nn.Dense(self.num_filters, kernel_init=xavier)(edge_attr)
        W = shifted_softplus(W)
        W = nn.Dense(self.num_filters, kernel_init=xavier)(W)
        C = 0.5 * (jnp.cos(edge_weight * math.pi / self.cutoff) + 1.0)
        C = C * (edge_weight < self.cutoff)
        W = W * C[:, None]
        x = nn.Dense(self.num_filters, use_bias=False, kernel_init=xavier)(h)
        if seg_plans is not None:
            # box-scale path (receiver-sorted edges): gather backward and
            # the segment reduction run the tiled sorted-segment Pallas
            # kernel (ops/pallas_sorted_segsum) — same recipe as EGNNLayer
            from ..ops.pallas_sorted_segsum import (sorted_gather,
                                                    sorted_segment_sum)

            (r_perm, r_starts, r_local, r_cfg) = seg_plans["rcv"]
            (s_perm, s_starts, s_local, s_cfg) = seg_plans["snd"]
            msg = sorted_gather(x, senders, s_perm, s_starts, s_local,
                                edge_mask, s_cfg) * W
            x = sorted_segment_sum(msg, r_perm, r_starts, r_local,
                                   receivers, edge_mask, r_cfg)
        else:
            msg = x[senders] * W
            x = segment_sum(msg, receivers, num_nodes, mask=edge_mask)
        x = nn.Dense(self.hidden_channels, kernel_init=xavier)(x)
        x = shifted_softplus(x)
        return nn.Dense(self.hidden_channels, kernel_init=xavier)(x)


class SchNetModel(nn.Module):
    """Constructor surface mirrors schnet.py:15-26 (same defaults)."""

    hidden_channels: int = 128
    in_dim: int = 1
    out_dim: int = 1
    num_filters: int = 128
    num_layers: int = 6
    num_gaussians: int = 50
    cutoff: float = 10.0
    max_num_neighbors: int = 32
    pool: str = "sum"

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False,
                 seg_plans=None):
        """``seg_plans``: optional sorted segment-tile plans (see
        EGNNModel) — the molecular-box fast path."""
        h = nn.Embed(100, self.hidden_channels,
                     embedding_init=nn.initializers.normal(1.0),  # torch Embedding default
                     name="embedding")(batch.atoms)
        edge_weight = safe_norm(
            batch.pos[batch.senders] - batch.pos[batch.receivers], axis=-1
        )
        edge_attr = gaussian_smearing(edge_weight, 0.0, self.cutoff,
                                      self.num_gaussians)
        for i in range(self.num_layers):
            h = h + SchNetInteraction(
                self.hidden_channels, self.num_filters, self.cutoff,
                name=f"interaction_{i}",
            )(h, batch.senders, batch.receivers, edge_weight, edge_attr,
              batch.edge_mask, seg_plans=seg_plans)
        out = POOL[self.pool](h, batch)
        # PyG SchNet.reset_parameters: xavier_uniform + zero bias on lin1/lin2
        xavier = nn.initializers.xavier_uniform()
        out = nn.Dense(self.hidden_channels // 2, kernel_init=xavier)(out)
        out = shifted_softplus(out)
        return nn.Dense(self.out_dim, kernel_init=xavier)(out)
