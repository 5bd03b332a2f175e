"""GVP-GNN (Jing et al.) — TPU-native redesign of
/root/reference/models/gvpgnn.py:9-127 and the GVPConv/GVPConvLayer stack of
/root/reference/models/layers/gvp_layer.py:246-439."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..nn import gvp
from ..nn.basic import (torch_linear_bias_init,
                        torch_linear_kernel_init)
from ..ops.pallas_gvp import gvp_message_xla, make_gvp_message_fused
from ..ops.radial import radial_embedding
from .pooling import POOL
from ..ops.norms import safe_norm


class GVPConv(nn.Module):
    """Message = GVP-chain over cat[(s_j,V_j), edge, (s_i,V_i)]; mean-aggregated
    (gvp_layer.py:246-324).

    With ``use_pallas=True`` the whole edge pass (endpoint gathers -> 3-GVP
    chain -> masked segment mean) runs as ONE fused Pallas launch per
    direction on TPU (ops/pallas_gvp.py).  Measured on-chip
    (scripts/trial_gvp_pallas.py): 1.261 vs 1.28 ms/step XLA in a bare
    100-step scan — but inside the whole-experiment resident program the
    Mosaic compile is pathological through the remote compile helper
    (CLI gvp run >560s vs ~44s XLA), so the XLA path is the DEFAULT and the
    kernel is opt-in.  Weights live as flat per-chain-layer params (same
    shapes/initializers as the nn/gvp.py module chain; fused==twin equality
    is tested in test_pallas.py)."""

    node_dims: Tuple[int, int]
    edge_dims: Tuple[int, int]
    n_layers: int = 3
    aggr: str = "mean"
    act_s: str = "relu"
    act_v: str = "sigmoid"
    vector_gate: bool = True
    use_pallas: bool = False
    # Rematerialize the edge chain in the backward pass (round 4): at
    # molecular-box scale the 3-GVP chain's live [E, ~176] activations
    # total 15.3 GB at 398k edges (XLA memory_analysis) — at the v5e HBM
    # edge, where the remote compile reproducibly dies.  Numerics
    # identical; costs one extra forward of the chain in bwd.
    remat: bool = False

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask,
                 seg_plans=None):
        s, v = x
        es, ev = edge_attr
        num_nodes = s.shape[0]
        si, vi = self.node_dims
        se, ve = self.edge_dims
        in_dims = (2 * si + se, 2 * vi + ve)
        dims_chain = [in_dims] + [self.node_dims] * self.n_layers
        assert self.aggr in ("mean", "add"), self.aggr

        if not (self.vector_gate and self.act_s == "relu"
                and self.act_v == "sigmoid"):
            if seg_plans is not None:
                raise ValueError(
                    "seg_plans (the sorted-segment Pallas path) is only "
                    "implemented for the default relu/sigmoid vector-gate "
                    "chain; drop seg_plans for general configs")
            # general configs run the nn/gvp.py module chain (the reference
            # builds the same GVP sequence, gvp_layer.py:283-302); the flat
            # fused-weight path below implements only the defaults
            return self._module_chain(x, senders, receivers, edge_attr,
                                      edge_mask, dims_chain)

        # torch.nn.Linear default inits, matching nn/gvp.py::GVP
        ki = torch_linear_kernel_init
        bi = torch_linear_bias_init
        ws = []
        for k in range(self.n_layers):
            (sik, vik), (sok, vok) = dims_chain[k], dims_chain[k + 1]
            hk = max(vik, vok)
            Wh = self.param(f"gvp{k}_wh", ki, (vik, hk))
            Wv = self.param(f"gvp{k}_wv", ki, (hk, vok))
            Wsm = self.param(f"gvp{k}_ws", ki, (sik + hk, sok))
            bs = self.param(f"gvp{k}_bs", bi(sik + hk), (sok,))
            Wsv = self.param(f"gvp{k}_wsv", ki, (sok, vok))
            bsv = self.param(f"gvp{k}_bsv", bi(sok), (vok,))
            ws += [Wh, Wv, Wsm, bs[None], Wsv, bsv[None]]

        vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
        evx, evy, evz = ev[..., 0], ev[..., 1], ev[..., 2]
        if self.use_pallas and jax.default_backend() != "cpu":
            assert seg_plans is None, "use_pallas and seg_plans are exclusive"
            fused = make_gvp_message_fused(None, n_layers=self.n_layers)
            out = fused(senders, receivers, edge_mask, s, vx, vy, vz,
                        es, evx, evy, evz, *ws)
        else:
            if self.remat:
                import functools as _ft

                f = jax.checkpoint(
                    _ft.partial(gvp_message_xla, n_layers=self.n_layers,
                                seg_plans=seg_plans))
                out = f(senders, receivers, edge_mask, s,
                        vx, vy, vz, es, evx, evy, evz, ws)
            else:
                out = gvp_message_xla(senders, receivers, edge_mask, s,
                                      vx, vy, vz, es, evx, evy, evz, ws,
                                      self.n_layers, seg_plans=seg_plans)
        ssum, sx, sy, sz, cnt = out
        if self.aggr == "mean":
            cnt = jnp.maximum(cnt, 1.0)
            ssum, sx, sy, sz = ssum / cnt, sx / cnt, sy / cnt, sz / cnt
        return ssum, jnp.stack([sx, sy, sz], axis=-1)

    def _module_chain(self, x, senders, receivers, edge_attr, edge_mask,
                      dims_chain):
        from ..ops.scatter import segment_sum

        s, v = x
        es, ev = edge_attr
        num_nodes = s.shape[0]
        ms = jnp.concatenate([s[senders], es, s[receivers]], axis=-1)
        mv = jnp.concatenate([v[senders], ev, v[receivers]], axis=-2)
        h = (ms, mv)
        for k in range(self.n_layers):
            last = k == self.n_layers - 1
            h = gvp.GVP(dims_chain[k], dims_chain[k + 1],
                        act_s=None if last else self.act_s,
                        act_v=None if last else self.act_v,
                        vector_gate=self.vector_gate, name=f"gvp_{k}")(h)
        ms_out, mv_out = h
        nv = mv_out.shape[-2]
        ssum = segment_sum(ms_out, receivers, num_nodes, mask=edge_mask)
        vsum = segment_sum(mv_out.reshape(mv_out.shape[0], nv * 3),
                           receivers, num_nodes, mask=edge_mask)
        vsum = vsum.reshape(num_nodes, nv, 3)
        if self.aggr == "mean":
            cnt = jnp.maximum(
                segment_sum(jnp.ones((senders.shape[0], 1), s.dtype),
                            receivers, num_nodes, mask=edge_mask), 1.0)
            ssum, vsum = ssum / cnt, vsum / cnt[..., None]
        return ssum, vsum


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
    use_pallas: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask,
                 train: bool = False, autoregressive_x=None,
                 node_mask=None, seg_plans=None):
        """``autoregressive_x``: if given, messages on backward edges
        (src >= dst) are formed from these embeddings instead of ``x``, with
        add-aggregation normalized by the total degree — the decoder mode of
        gvp_layer.py:386-423.  ``node_mask``: only update the masked nodes
        (gvp_layer.py:427-437), via jnp.where (static shapes)."""
        conv = GVPConv(
            self.node_dims, self.edge_dims, self.n_message,
            aggr="add" if autoregressive_x is not None else "mean",
            act_s=self.act_s, act_v=self.act_v,
            vector_gate=self.vector_gate, use_pallas=self.use_pallas,
            remat=self.remat,
            name="conv",
        )
        if autoregressive_x is not None:
            assert seg_plans is None, (
                "seg_plans are built against the full edge_mask; the "
                "autoregressive split masks differ — drop seg_plans")
            forward = senders < receivers
            dh_f = conv(x, senders, receivers, edge_attr,
                        edge_mask & forward)
            dh_b = conv(autoregressive_x, senders, receivers, edge_attr,
                        edge_mask & ~forward)
            from ..ops.scatter import segment_sum
            count = jnp.maximum(
                segment_sum(jnp.ones((senders.shape[0], 1), x[0].dtype),
                            receivers, x[0].shape[0], mask=edge_mask),
                1.0)
            dh = ((dh_f[0] + dh_b[0]) / count,
                  (dh_f[1] + dh_b[1]) / count[..., None])
        else:
            dh = conv(x, senders, receivers, edge_attr, edge_mask,
                      seg_plans=seg_plans)
        x_old = x
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
        if node_mask is not None:
            x = (jnp.where(node_mask[:, None], x[0], x_old[0]),
                 jnp.where(node_mask[:, None, None], x[1], x_old[1]))
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
    use_pallas: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False,
                 seg_plans=None):
        """``seg_plans``: optional {'rcv': (perm, starts, local, cfg),
        'snd': ...} sorted segment-tile plans (ops/pallas_sorted_segsum::
        batch_seg_plans) — routes every layer's wide merged reduction and
        send-gather backward through the tiled sorted-segment Pallas
        kernel (round 5, VERDICT item 6)."""
        vectors = batch.pos[batch.senders] - batch.pos[batch.receivers]
        lengths = safe_norm(vectors, axis=-1, keepdims=True)

        h_s = nn.Embed(self.in_dim, self.s_dim,
                       embedding_init=nn.initializers.normal(1.0),  # torch Embedding default
                       name="emb_in")(batch.atoms)
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
                node_dims, edge_dims, residual=self.residual,
                use_pallas=self.use_pallas, remat=self.remat,
                name=f"layer_{i}",
            )(h_V, batch.senders, batch.receivers, h_E, batch.edge_mask,
              train, seg_plans=seg_plans)

        out = POOL[self.pool](gvp.merge(*h_V), batch)
        # reference readout = raw torch Sequential(Linear, ReLU, Linear)
        # (gvpgnn.py:92-101)
        if not self.equivariant_pred:
            out = out[:, : self.s_dim]
            out = nn.Dense(self.s_dim, kernel_init=torch_linear_kernel_init,
                           bias_init=torch_linear_bias_init(self.s_dim))(out)
            out = nn.relu(out)
            return nn.Dense(self.out_dim,
                            kernel_init=torch_linear_kernel_init,
                            bias_init=torch_linear_bias_init(self.s_dim))(out)
        return nn.Dense(self.out_dim, kernel_init=torch_linear_kernel_init,
                        bias_init=torch_linear_bias_init(out.shape[-1]),
                        name="pred")(out)
