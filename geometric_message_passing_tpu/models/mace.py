"""MACE (higher body-order equivariant message passing) — TPU-native redesign
of /root/reference/models/mace.py:16-191."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..graph import GraphBatch
from ..irreps import Irreps
from ..nn.conv import EquivariantProductBasisBlock, TensorProductConvLayer
from ..nn.equivariant import pad_to_irreps, reshape_irreps
from ..ops.radial import radial_embedding
from ..ops.spherical import spherical_harmonics
from ..nn.basic import torch_linear_bias_init, torch_linear_kernel_init
from .pooling import POOL
from ..ops.norms import safe_norm


class MACEModel(nn.Module):
    """Constructor surface mirrors mace.py:20-38 (same defaults)."""

    r_max: float = 10.0
    num_bessel: int = 8
    num_polynomial_cutoff: int = 5
    max_ell: int = 2
    correlation: int = 3
    num_layers: int = 5
    emb_dim: int = 64
    hidden_irreps: Optional[str] = None
    mlp_dim: int = 256
    in_dim: int = 1
    out_dim: int = 1
    aggr: str = "sum"
    pool: str = "sum"
    batch_norm: bool = True
    residual: bool = True
    equivariant_pred: bool = False
    # mul-sharded tensor parallelism (parallel/tp.py): when tp_axis is set the
    # module is constructed with LOCAL emb_dim (= full/k) and runs under
    # shard_map; channel-mixing ops psum over tp_axis.
    tp_axis: Optional[str] = None
    tp_size: int = 1
    # bf16 storage/compute for the per-edge TP weight tensor (see
    # nn/conv.py::TensorProductConvLayer.weights_bf16) — opt-in speed knob;
    # measured tradeoff in RESULTS.md (star MAE degrades, paired_star doesn't)
    weights_bf16: bool = False
    # matmul precision for the equivariant core (edge TP + symmetric
    # contraction + product linear).  TPU f32 einsums default to single
    # bf16 MXU passes, which systematically degrades MACE vs the reference's
    # true-f32 torch numerics (star anchor 0.0832 default vs 0.0774
    # 'highest', ref 0.0766 — round-3 ablation, RESULTS.md).  The edge-MLP
    # weight-head GEMMs are left at default precision (FLOP-bound, not
    # quality-critical at these scales... they feed the TP which rounds
    # identically either way).
    tp_precision: Optional[str] = "highest"
    # which stages get tp_precision: 'all' (conv TP + product basis),
    # 'conv' (edge TP only), 'prod' (symmetric contraction + product
    # linear only) or 'heads' (= all + the fc weight-head GEMMs — one step
    # short of full f32).  Round-4 scoping ablation (n=5, RESULTS.md):
    # conv-only 0.0766 +- 0.0013 at ~31 s/run vs all 0.0784 +- 0.0018 at
    # 34 s vs full-f32 0.0774 +- 0.0023 at 44 s vs ref 0.0766 — the edge TP
    # is THE precision-sensitive stage; exact-f32 there alone reaches
    # reference parity at the lowest cost, so 'conv' is the default.
    tp_precision_scope: str = "conv"

    def _scoped_precision(self, stage: str) -> Optional[str]:
        if self.tp_precision is None:
            return None
        scopes = ("all", "heads") if stage != "heads" else ("heads",)
        return (self.tp_precision
                if self.tp_precision_scope in scopes + (stage,) else None)

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
                gate=False,
                tp_axis=self.tp_axis,
                tp_size=self.tp_size,
                weights_bf16=self.weights_bf16,
                tp_precision=self._scoped_precision("conv"),
                head_precision=self._scoped_precision("heads"),
                name=f"conv_{i}",
            )(h, batch.senders, batch.receivers, edge_sh, edge_feats,
              edge_mask=batch.edge_mask, node_mask=batch.node_mask, train=train)
            # self-connection: previous h zero-padded to hidden width (mace.py:181)
            sc = pad_to_irreps(h, h_update.shape[-1])
            h = EquivariantProductBasisBlock(
                node_feats_irreps=hidden,
                target_irreps=hidden,
                correlation=self.correlation,
                use_sc=self.residual,
                element_dependent=False,
                num_elements=self.in_dim,
                tp_axis=self.tp_axis,
                tp_size=self.tp_size,
                precision=self._scoped_precision("prod"),
                name=f"prod_{i}",
            )(reshape_irreps(h_update, hidden), sc, None)

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
            out = out[:, : self.emb_dim]  # scalar slice (mace.py:188)
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
