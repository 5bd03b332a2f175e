"""GVP-GNN (Jing et al.) — TPU-native redesign of
/root/reference/models/gvpgnn.py:9-127 and the GVPConv/GVPConvLayer stack of
/root/reference/models/layers/gvp_layer.py:246-439."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..graph import GraphBatch
from ..nn import gvp
from ..ops.radial import radial_embedding
from ..ops.scatter import segment_mean, segment_sum
from .pooling import POOL
from ..ops.norms import safe_norm


class GVPConv(nn.Module):
    """Message = GVP-chain over cat[(s_j,V_j), edge, (s_i,V_i)]; mean-aggregated
    (gvp_layer.py:246-324)."""

    node_dims: Tuple[int, int]
    edge_dims: Tuple[int, int]
    n_layers: int = 3
    aggr: str = "mean"
    act_s: str = "relu"
    act_v: str = "sigmoid"
    vector_gate: bool = True

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask):
        s, v = x
        num_nodes = s.shape[0]
        msg_in = gvp.tuple_cat(
            (s[senders], v[senders]), edge_attr, (s[receivers], v[receivers])
        )
        si, vi = self.node_dims
        se, ve = self.edge_dims
        in_dims = (2 * si + se, 2 * vi + ve)
        h = msg_in
        dims_chain = [in_dims] + [self.node_dims] * self.n_layers
        for k in range(self.n_layers):
            last = k == self.n_layers - 1
            h = gvp.GVP(
                dims_chain[k],
                dims_chain[k + 1],
                act_s=None if last else self.act_s,
                act_v=None if last else self.act_v,
                vector_gate=self.vector_gate,
                name=f"gvp_{k}",
            )(h)
        ms, mv = h
        agg = segment_mean if self.aggr == "mean" else segment_sum
        return (
            agg(ms, receivers, num_nodes, mask=edge_mask),
            agg(mv, receivers, num_nodes, mask=edge_mask),
        )


class GVPConvLayer(nn.Module):
    """Conv + residual/norm + pointwise GVP feed-forward (gvp_layer.py:327-439)."""

    node_dims: Tuple[int, int]
    edge_dims: Tuple[int, int]
    n_message: int = 3
    n_feedforward: int = 2
    drop_rate: float = 0.1
    act_s: str = "relu"
    act_v: str = "sigmoid"
    vector_gate: bool = True
    residual: bool = True

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask,
                 train: bool = False):
        dh = GVPConv(
            self.node_dims, self.edge_dims, self.n_message,
            aggr="mean", act_s=self.act_s, act_v=self.act_v,
            vector_gate=self.vector_gate, name="conv",
        )(x, senders, receivers, edge_attr, edge_mask)
        drop0 = gvp.GVPDropout(self.drop_rate, name="drop0")
        drop1 = gvp.GVPDropout(self.drop_rate, name="drop1")
        norm0 = gvp.GVPLayerNorm(self.node_dims, name="norm0")
        norm1 = gvp.GVPLayerNorm(self.node_dims, name="norm1")
        if self.residual:
            x = norm0(gvp.tuple_sum(x, drop0(dh, deterministic=not train)))
        else:
            x = dh
        h = x
        if self.n_feedforward == 1:
            h = gvp.GVP(self.node_dims, self.node_dims, act_s=None, act_v=None,
                        vector_gate=self.vector_gate, name="ff_0")(h)
        else:
            hid = (4 * self.node_dims[0], 2 * self.node_dims[1])
            h = gvp.GVP(self.node_dims, hid, act_s=self.act_s, act_v=self.act_v,
                        vector_gate=self.vector_gate, name="ff_0")(h)
            for k in range(self.n_feedforward - 2):
                h = gvp.GVP(hid, hid, act_s=self.act_s, act_v=self.act_v,
                            vector_gate=self.vector_gate, name=f"ff_{k+1}")(h)
            h = gvp.GVP(hid, self.node_dims, act_s=None, act_v=None,
                        vector_gate=self.vector_gate,
                        name=f"ff_{self.n_feedforward-1}")(h)
        if self.residual:
            x = norm1(gvp.tuple_sum(x, drop1(h, deterministic=not train)))
        else:
            x = h
        return x


class GVPGNNModel(nn.Module):
    """Constructor surface mirrors gvpgnn.py:13-28 (same defaults)."""

    r_max: float = 10.0
    num_bessel: int = 8
    num_polynomial_cutoff: int = 5
    num_layers: int = 5
    in_dim: int = 1
    out_dim: int = 1
    s_dim: int = 128
    v_dim: int = 16
    s_dim_edge: int = 32
    v_dim_edge: int = 1
    pool: str = "sum"
    residual: bool = True
    equivariant_pred: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        vectors = batch.pos[batch.senders] - batch.pos[batch.receivers]
        lengths = safe_norm(vectors, axis=-1, keepdims=True)

        h_s = nn.Embed(self.in_dim, self.s_dim, name="emb_in")(batch.atoms)
        edge_s = radial_embedding(
            lengths, self.r_max, self.num_bessel, self.num_polynomial_cutoff
        )
        unit = jnp.where(lengths > 1e-12, vectors / jnp.maximum(lengths, 1e-12), 0.0)
        edge_v = unit[:, None, :]  # [E, 1, 3]

        node_dims = (self.s_dim, self.v_dim)
        edge_dims = (self.s_dim_edge, self.v_dim_edge)

        # W_v: LayerNorm + GVP on scalar-only input (gvpgnn.py:61-65)
        h_s = nn.LayerNorm(epsilon=1e-5)(h_s)
        h_V = gvp.GVP((self.s_dim, 0), node_dims, act_s=None, act_v=None,
                      vector_gate=True, name="W_v")(h_s)
        # W_e (gvpgnn.py:73-77)
        e_in = gvp.GVPLayerNorm((self.num_bessel, 1), name="W_e_norm")(
            (edge_s, edge_v)
        )
        h_E = gvp.GVP((self.num_bessel, 1), edge_dims, act_s=None, act_v=None,
                      vector_gate=True, name="W_e")(e_in)

        for i in range(self.num_layers):
            h_V = GVPConvLayer(
                node_dims, edge_dims, residual=self.residual, name=f"layer_{i}",
            )(h_V, batch.senders, batch.receivers, h_E, batch.edge_mask, train)

        out = POOL[self.pool](gvp.merge(*h_V), batch)
        if not self.equivariant_pred:
            out = out[:, : self.s_dim]
            out = nn.Dense(self.s_dim)(out)
            out = nn.relu(out)
            return nn.Dense(self.out_dim)(out)
        return nn.Dense(self.out_dim, name="pred")(out)
