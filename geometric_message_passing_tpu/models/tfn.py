"""Tensor Field Network (Thomas, Smidt et al.) — TPU-native redesign of
/root/reference/models/tfn.py:42-191."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..graph import GraphBatch
from ..irreps import Irreps
from ..nn.conv import TensorProductConvLayer
from ..nn.equivariant import pad_to_irreps
from ..ops.radial import radial_embedding
from ..ops.spherical import spherical_harmonics
from ..nn.basic import torch_linear_bias_init, torch_linear_kernel_init
from .pooling import POOL
from ..ops.norms import safe_norm


class TFNModel(nn.Module):
    """Constructor surface mirrors tfn.py:46-64 (same defaults)."""

    r_max: float = 10.0
    num_bessel: int = 8
    num_polynomial_cutoff: int = 5
    max_ell: int = 2
    num_layers: int = 5
    emb_dim: int = 64
    hidden_irreps: Optional[str] = None
    mlp_dim: int = 256
    in_dim: int = 1
    out_dim: int = 1
    aggr: str = "sum"
    pool: str = "first"
    gate: bool = True
    batch_norm: bool = False
    residual: bool = True
    equivariant_pred: bool = False
    # mul-sharded tensor parallelism (parallel/tp.py, same recipe as
    # MACEModel): constructed with LOCAL emb_dim (= full/k) under shard_map;
    # channel-mixing ops psum over tp_axis.  Gate runs locally after the
    # psum+slice (see nn/conv.py setup note on unsimplified gates).
    tp_axis: Optional[str] = None
    tp_size: int = 1
    # bf16 storage/compute for the per-edge TP weight tensor (see
    # nn/conv.py::TensorProductConvLayer.weights_bf16) — opt-in speed knob;
    # measured tradeoff in RESULTS.md (star MAE degrades, paired_star doesn't)
    weights_bf16: bool = False
    # matmul precision for the edge-TP einsums (see MACEModel.tp_precision).
    # Round-3 measurement: scoped exact-f32 passes take TFN from parity
    # (0.0680 vs ref 0.0667 at default bf16-pass numerics) to BEATING the
    # reference (star 0.0637 +- 0.0009, n=3) at +24% step time (90 vs 72
    # s/run, still 6.4x the reference's 575 s) — so 'highest' is the
    # default; pass --tp_precision default for the faster numerics.
    tp_precision: Optional[str] = "highest"

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        sh_irreps = Irreps.spherical_harmonics(self.max_ell)
        hidden = (
            Irreps(self.hidden_irreps)
            if self.hidden_irreps is not None
            else (sh_irreps * self.emb_dim).sort().simplify()
        )
        h = nn.Embed(self.in_dim, self.emb_dim,
                     embedding_init=nn.initializers.normal(1.0),  # torch Embedding default
                     name="emb_in")(batch.atoms)

        vectors = batch.pos[batch.senders] - batch.pos[batch.receivers]
        lengths = safe_norm(vectors, axis=-1, keepdims=True)
        edge_sh = spherical_harmonics(vectors, self.max_ell)
        edge_feats = radial_embedding(
            lengths, self.r_max, self.num_bessel, self.num_polynomial_cutoff
        )

        for i in range(self.num_layers):
            in_irreps = Irreps(f"{self.emb_dim}x0e") if i == 0 else hidden
            h_update = TensorProductConvLayer(
                in_irreps=in_irreps,
                out_irreps=hidden,
                sh_irreps=sh_irreps,
                mlp_dim=self.mlp_dim,
                aggr=self.aggr,
                batch_norm=self.batch_norm,
                gate=self.gate,
                tp_axis=self.tp_axis,
                tp_size=self.tp_size,
                weights_bf16=self.weights_bf16,
                tp_precision=self.tp_precision,
                name=f"conv_{i}",
            )(h, batch.senders, batch.receivers, edge_sh, edge_feats,
              edge_mask=batch.edge_mask, node_mask=batch.node_mask, train=train)
            # residual: zero-pad h to the update width (tfn.py:182)
            h = (
                h_update + pad_to_irreps(h, h_update.shape[-1])
                if self.residual
                else h_update
            )

        out = POOL[self.pool](h, batch)
        if self.tp_axis is not None:
            from ..nn.basic import RowParallelDense

            if not self.equivariant_pred:
                out = out[:, : self.emb_dim]  # local scalar slice
                out = RowParallelDense(self.emb_dim * self.tp_size,
                                       self.tp_axis, name="Dense_0")(out)
                out = nn.relu(out)
                # replicated after the psum; second Dense is replicated too
                return nn.Dense(self.out_dim, name="Dense_1")(out)
            return RowParallelDense(self.out_dim, self.tp_axis,
                                    name="pred")(out)
        if not self.equivariant_pred:
            out = out[:, : self.emb_dim]  # scalar slice (tfn.py:188)
            # reference readout = raw torch Sequential(Linear, ReLU, Linear)
            out = nn.Dense(self.emb_dim, kernel_init=torch_linear_kernel_init,
                           bias_init=torch_linear_bias_init(self.emb_dim))(out)
            out = nn.relu(out)
            return nn.Dense(self.out_dim,
                            kernel_init=torch_linear_kernel_init,
                            bias_init=torch_linear_bias_init(self.emb_dim))(out)
        return nn.Dense(self.out_dim, kernel_init=torch_linear_kernel_init,
                        bias_init=torch_linear_bias_init(out.shape[-1]),
                        name="pred")(out)
