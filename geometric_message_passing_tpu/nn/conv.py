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

from ..irreps import Irreps
from ..ops.scatter import segment_mean, segment_sum
from .basic import (MLP, torch_linear_bias_init,
                    torch_linear_kernel_init)
from .equivariant import EquivariantBatchNorm, Gate, Activation, irreps2gate
from .tensor_product import EdgeTensorProduct


class TensorProductConvLayer(nn.Module):
    """``tp_axis``/``tp_size`` enable mul-sharded tensor parallelism: the
    module is then constructed with LOCAL (1/k) multiplicities, the edge TP
    maps local-mul inputs to FULL-mul outputs (row-parallel — per-edge
    weights hold this shard's input channels against all output channels),
    and after the segment reduction one ``psum`` over ``tp_axis`` completes
    the channel contraction before slicing back to the local shard.  One
    [N, hidden] psum per layer — the Megatron row-parallel pattern mapped to
    irrep multiplicities (SURVEY §2.5 TP mandate)."""

    in_irreps: Irreps
    out_irreps: Irreps
    sh_irreps: Irreps
    mlp_dim: int = 256
    aggr: str = "sum"           # 'sum'/'add' or 'mean'
    batch_norm: bool = False
    gate: bool = False
    tp_axis: Optional[str] = None
    tp_size: int = 1
    # Per-edge TP weights are the memory giant of the layer ([E, sum_p u*w]
    # ~ 94k floats/edge at 64 channels, max_ell=3 — 1.6GB fwd at E~4k).
    # Storing them bf16 halves the HBM traffic of the hot tensor and is
    # ~1.5x faster (MACE star); but the rounding is NOT free in quality on
    # all tasks (MACE star MAE 0.0833 bf16 vs 0.0767 f32, RESULTS.md), so
    # like every precision knob here it is opt-in.  Gradients stay f32.
    weights_bf16: bool = False
    # jax matmul precision for the TP einsums ('highest' = exact f32).
    # TPU f32 einsums default to single bf16 MXU passes; MACE's quality is
    # sensitive to the rounding of the per-edge weight operand (round-3
    # ablation, RESULTS.md), so MACEModel passes 'highest' here while the
    # FLOP-bound edge-MLP head GEMMs stay at default precision.
    tp_precision: Optional[str] = None
    # matmul precision for the fc weight-HEAD GEMMs (the producers of the
    # per-edge TP weight operand — the rounding-sensitive input of the TP,
    # round-3 ablation).  Separate from tp_precision so the scoping ablation
    # can price this stage alone (round-4 VERDICT item 4b).
    head_precision: Optional[str] = None

    def setup(self):
        out_irreps = Irreps(self.out_irreps)
        if self.gate:
            irreps_scalars, irreps_gates, irreps_gated = irreps2gate(out_irreps)
            if self.tp_axis is not None and irreps_gated.num_irreps > 0:
                # Under mul-sharded TP the gates must stay UNSIMPLIFIED (one
                # 0e entry per gated irrep): shard_mul_slice slices each
                # output entry's mul axis independently, so a merged gates
                # entry would pair shard p's gated channels with the wrong
                # gate scalars.  Per-entry gates keep channel correspondence
                # exact; the TP function is unchanged (same per-entry fan-in
                # normalization, weight columns merely regrouped — the
                # sharder maps them, parallel/tp.py::_head_col_index).
                from ..irreps import Irrep

                irreps_gates = Irreps(
                    [(mul, Irrep(0, 1)) for mul, _ in irreps_gated])
            if irreps_gated.num_irreps == 0:
                self._gate = Activation(out_irreps, act="silu")
                tp_out = out_irreps
            else:
                self._gate = Gate(irreps_scalars, irreps_gates, irreps_gated)
                tp_out = self._gate.irreps_in  # scalars + gates + gated
        else:
            self._gate = None
            tp_out = out_irreps
        if self.tp_axis is not None:
            from .equivariant import scale_mul
            import math

            self._tp_out_full = scale_mul(tp_out, self.tp_size)
            self.tp = EdgeTensorProduct(
                Irreps(self.in_irreps), Irreps(self.sh_irreps),
                self._tp_out_full,
                path_weight_scale=1.0 / math.sqrt(self.tp_size),
                precision=self.tp_precision,
            )
        else:
            self._tp_out_full = None
            self.tp = EdgeTensorProduct(
                Irreps(self.in_irreps), Irreps(self.sh_irreps), tp_out,
                precision=self.tp_precision,
            )
        # The edge MLP's trunk is shared; the FINAL Dense is split into one
        # head per output-irrep group so the per-edge weights are produced
        # directly in per-group tensors.  A single [E, weight_numel] output
        # sliced per group compiled to full-tensor copies (+ relayouts for
        # the batched TP dots) — ~1.1 GB/step of copy traffic for TFN
        # (RESULTS.md).  Same math: Dense init distributions depend only on
        # fan-in, which is identical for every head.
        # torch_init: the reference's weight MLP is a raw torch Sequential
        # (tfn_layer.py:73-77) left on torch.nn.Linear default init
        self.fc = MLP(
            hidden=(self.mlp_dim,),
            activation="relu",
            norm=None,
            act_final=True,
            torch_init=True,
        )
        head_dtype = "bfloat16" if self.weights_bf16 else None
        self.fc_heads = [
            nn.Dense(n, dtype=head_dtype,
                     precision=self.head_precision,
                     kernel_init=torch_linear_kernel_init,
                     bias_init=torch_linear_bias_init(self.mlp_dim),
                     name=f"fc_out{g}")
            for g, n in enumerate(self.tp.group_weight_numels)
        ]
        self._bn = (
            EquivariantBatchNorm(out_irreps) if self.batch_norm else None
        )

    def __call__(self, node_feats, senders, receivers, edge_sh, edge_feats,
                 edge_mask=None, node_mask=None, train: bool = False):
        """node_feats: [N, in_irreps.dim]. Returns [N, out_irreps.dim]."""
        num_nodes = node_feats.shape[0]
        a = self.fc(edge_feats)
        ws = [head(a) for head in self.fc_heads]  # bf16 when weights_bf16
        msg = self.tp.apply_grouped(node_feats[receivers], edge_sh, ws)
        if self.aggr in ("sum", "add"):
            out = segment_sum(msg, senders, num_nodes, mask=edge_mask)
        elif self.aggr == "mean":
            out = segment_mean(msg, senders, num_nodes, mask=edge_mask)
        else:
            raise ValueError(self.aggr)
        if self.tp_axis is not None:
            import jax
            from .equivariant import shard_mul_slice

            out = jax.lax.psum(out, axis_name=self.tp_axis)
            out = shard_mul_slice(out, self._tp_out_full, self.tp_size,
                                  jax.lax.axis_index(self.tp_axis))
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
    tp_axis: Optional[str] = None
    tp_size: int = 1
    precision: Optional[str] = None  # matmul precision for chain + linear
    # Process nodes in blocks of this size (round 3, molecular-box scale):
    # the symmetric contraction materializes O(n * c * d^2) intermediates
    # (x (x) x and the projected chain) — several GB at n >= 100k, which
    # crashes the TPU compile helper's buffer planning.  Node blocks are
    # independent, so an nn.scan with a rematerialized body bounds the
    # working set to one block.  None = single pass (identical numerics).
    node_chunk: Optional[int] = None

    @nn.compact
    def __call__(self, node_feats, sc=None, node_attrs=None):
        import jax.numpy as jnp

        n = node_feats.shape[0]
        C = self.node_chunk
        if C is None or n <= C or self.tp_axis is not None:
            return self._block(node_feats, sc, node_attrs)
        assert not self.element_dependent or node_attrs is not None
        n_chunks = -(-n // C)
        pad = n_chunks * C - n

        def pad_to(x):
            if x is None or not pad:
                return x
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

        nf = pad_to(node_feats).reshape((n_chunks, C) + node_feats.shape[1:])
        xs = [nf]
        has_sc = sc is not None
        has_attrs = node_attrs is not None
        if has_sc:
            xs.append(pad_to(sc).reshape((n_chunks, C) + sc.shape[1:]))
        if has_attrs:
            xs.append(pad_to(node_attrs).reshape(
                (n_chunks, C) + node_attrs.shape[1:]))

        def body(mdl, carry, x):
            it = iter(x)
            nf_c = next(it)
            sc_c = next(it) if has_sc else None
            at_c = next(it) if has_attrs else None
            return carry, mdl._block(nf_c, sc_c, at_c)

        body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(body, variable_broadcast=["params", "u_tables"],
                       split_rngs={"params": False})
        _, out = scan(self, 0, tuple(xs))
        return out.reshape((n_chunks * C,) + out.shape[2:])[:n]

    def _block(self, node_feats, sc=None, node_attrs=None):
        from .symmetric_contraction import SymmetricContraction
        from .equivariant import IrrepsLinear

        x = SymmetricContraction(
            irreps_in=Irreps(self.node_feats_irreps),
            irreps_out=Irreps(self.target_irreps),
            correlation=self.correlation,
            element_dependent=self.element_dependent,
            num_elements=self.num_elements,
            chain_precision=self.precision,
        )(node_feats, node_attrs)
        if self.tp_axis is not None:
            # row-parallel channel mix: local-mul in -> full-mul out, psum,
            # slice back to this shard (SymmetricContraction is channel-wise
            # so it needs no communication)
            import jax
            from .equivariant import scale_mul, shard_mul_slice

            target_full = scale_mul(Irreps(self.target_irreps), self.tp_size)
            out = IrrepsLinear(Irreps(self.target_irreps), target_full,
                               fan_mult=self.tp_size,
                               precision=self.precision)(x)
            out = jax.lax.psum(out, axis_name=self.tp_axis)
            out = shard_mul_slice(out, target_full, self.tp_size,
                                  jax.lax.axis_index(self.tp_axis))
        else:
            out = IrrepsLinear(Irreps(self.target_irreps),
                               Irreps(self.target_irreps),
                               precision=self.precision)(x)
        if self.use_sc and sc is not None:
            out = out + sc
        return out
