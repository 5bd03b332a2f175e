"""TensorProductConvLayer — the single equivariant graph conv shared by the
TFN and MACE models (redesign of /root/reference/models/layers/tfn_layer.py:8-93).

Per edge: tp(node_feats[dst], edge_sh, mlp(edge_feats)), then segment-reduce
onto ``src``.  NOTE the aggregation direction quirk of the reference
(messages formed from node_attr[dst] scattered to src, tfn_layer.py:83-87) is
replicated exactly — with undirected (symmetrized) edge lists the two
directions are equivalent, but we keep bit-parity with the reference.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..irreps import Irreps
from ..ops.scatter import segment_mean, segment_sum
from .basic import MLP
from .equivariant import EquivariantBatchNorm, Gate, Activation, irreps2gate
from .tensor_product import EdgeTensorProduct


class TensorProductConvLayer(nn.Module):
    in_irreps: Irreps
    out_irreps: Irreps
    sh_irreps: Irreps
    mlp_dim: int = 256
    aggr: str = "sum"           # 'sum'/'add' or 'mean'
    batch_norm: bool = False
    gate: bool = False

    def setup(self):
        out_irreps = Irreps(self.out_irreps)
        if self.gate:
            irreps_scalars, irreps_gates, irreps_gated = irreps2gate(out_irreps)
            if irreps_gated.num_irreps == 0:
                self._gate = Activation(out_irreps, act="silu")
                tp_out = out_irreps
            else:
                self._gate = Gate(irreps_scalars, irreps_gates, irreps_gated)
                tp_out = self._gate.irreps_in  # scalars + gates + gated
        else:
            self._gate = None
            tp_out = out_irreps
        self.tp = EdgeTensorProduct(Irreps(self.in_irreps), Irreps(self.sh_irreps), tp_out)
        self.fc = MLP(
            hidden=(self.mlp_dim, self.tp.weight_numel),
            activation="relu",
            norm=None,
            act_final=False,
        )
        self._bn = (
            EquivariantBatchNorm(out_irreps) if self.batch_norm else None
        )

    def __call__(self, node_feats, senders, receivers, edge_sh, edge_feats,
                 edge_mask=None, node_mask=None, train: bool = False):
        """node_feats: [N, in_irreps.dim]. Returns [N, out_irreps.dim]."""
        num_nodes = node_feats.shape[0]
        w = self.fc(edge_feats)
        msg = self.tp.apply(node_feats[receivers], edge_sh, w)
        if self.aggr in ("sum", "add"):
            out = segment_sum(msg, senders, num_nodes, mask=edge_mask)
        elif self.aggr == "mean":
            out = segment_mean(msg, senders, num_nodes, mask=edge_mask)
        else:
            raise ValueError(self.aggr)
        if self._gate is not None:
            out = self._gate(out)
        if self._bn is not None:
            # node_mask keeps pad nodes out of the batch statistics
            out = self._bn(out, train=train, mask=node_mask)
        return out


class EquivariantProductBasisBlock(nn.Module):
    """SymmetricContraction -> IrrepsLinear -> (+ self connection)
    (redesign of /root/reference/models/mace_modules/blocks.py:99-135)."""

    node_feats_irreps: Irreps
    target_irreps: Irreps
    correlation: int
    use_sc: bool = True
    element_dependent: bool = False
    num_elements: Optional[int] = None

    @nn.compact
    def __call__(self, node_feats, sc=None, node_attrs=None):
        from .symmetric_contraction import SymmetricContraction
        from .equivariant import IrrepsLinear

        x = SymmetricContraction(
            irreps_in=Irreps(self.node_feats_irreps),
            irreps_out=Irreps(self.target_irreps),
            correlation=self.correlation,
            element_dependent=self.element_dependent,
            num_elements=self.num_elements,
        )(node_feats, node_attrs)
        out = IrrepsLinear(Irreps(self.target_irreps), Irreps(self.target_irreps))(x)
        if self.use_sc and sc is not None:
            out = out + sc
        return out
