"""Production-scale TFN stack over the 'uvu' edge tensor product.

The zoo TFNModel mirrors the reference research config
(/root/reference/models/tfn.py:42-191 over tfn_layer.py:68-93): a per-edge
FULLY-CONNECTED tensor product whose edge-MLP weight tensor is
O(E * mul^2 * n_paths) — ~94k floats per edge at 64 channels / max_ell 3.
At molecular-box scale (>=100k edges -> tens of GB per layer) that conv
cannot exist on ANY hardware; the same impossibility argument as
models/mace_ff.py's header, and the reason production e3nn-family force
fields (NequIP, Allegro, MACE) all use 'uvu' instructions.

This module is the TFN-shaped member of that family: the zoo TFN's
macro-structure (embed -> L x [conv -> gate -> zero-pad residual] ->
invariant readout, tfn.py:165-190) with the conv swapped for the
O(E * n_paths * mul) uvu TP + post-linear (the NequIP interaction form,
built from the same EdgeTensorProductUVU/_conv machinery as the MACE
interaction blocks, incl. the edge-chunked scale path).  It is the scale
benchmark's TFN representative (scripts/bench_scale.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..graph import GraphBatch
from ..irreps import Irreps
from ..nn.basic import torch_linear_bias_init, torch_linear_kernel_init
from ..nn.equivariant import Gate, Activation, irreps2gate, pad_to_irreps
from ..nn.mace_blocks import RealAgnosticInteractionBlock
from ..nn.equivariant import inverse_reshape_irreps
from ..ops.norms import safe_norm
from ..ops.radial import radial_embedding
from ..ops.spherical import spherical_harmonics
from .pooling import POOL


class TFNForceField(nn.Module):
    """``model(batch) -> [G, out_dim]`` — same GraphBatch contract as the
    zoo; scalar-slice invariant readout like TFNModel (tfn.py:186-188)."""

    r_max: float = 10.0
    num_bessel: int = 8
    num_polynomial_cutoff: int = 5
    max_ell: int = 2
    num_layers: int = 4
    emb_dim: int = 64
    in_dim: int = 8
    out_dim: int = 1
    avg_num_neighbors: float = 12.0
    pool: str = "sum"
    gate: bool = True
    residual: bool = True
    edge_chunk: Optional[int] = None      # see _InteractionBase._conv
    node_chunk: Optional[int] = 16384     # see FullyConnectedTensorProduct
    tp_precision: Optional[str] = None    # fast numerics by default at scale

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        sh_irreps = Irreps.spherical_harmonics(self.max_ell)
        hidden = (sh_irreps * self.emb_dim).sort().simplify()
        attrs_irreps = Irreps(f"{self.in_dim}x0e")
        scalar_irreps = Irreps(f"{self.emb_dim}x0e")
        node_attrs = jnp.asarray(
            jnp.eye(self.in_dim, dtype=jnp.float32)[batch.atoms])

        h = nn.Embed(self.in_dim, self.emb_dim,
                     embedding_init=nn.initializers.normal(1.0),
                     name="emb_in")(batch.atoms)

        vectors = batch.pos[batch.senders] - batch.pos[batch.receivers]
        lengths = safe_norm(vectors, axis=-1, keepdims=True)
        edge_sh = spherical_harmonics(vectors, self.max_ell)
        edge_feats = radial_embedding(
            lengths, self.r_max, self.num_bessel, self.num_polynomial_cutoff
        )

        scalars, gates, gated = irreps2gate(hidden)
        n_scalar = scalars.dim
        for i in range(self.num_layers):
            in_irreps = scalar_irreps if i == 0 else hidden
            m, _ = RealAgnosticInteractionBlock(
                node_attrs_irreps=attrs_irreps,
                node_feats_irreps=in_irreps,
                edge_attrs_irreps=sh_irreps,
                edge_feats_irreps=Irreps(f"{self.num_bessel}x0e"),
                target_irreps=hidden,
                hidden_irreps=hidden,
                avg_num_neighbors=self.avg_num_neighbors,
                edge_chunk=self.edge_chunk,
                node_chunk=self.node_chunk,
                precision=self.tp_precision,
                name=f"interaction_{i}",
            )(node_attrs, h, edge_sh, edge_feats, batch.senders,
              batch.receivers, batch.edge_mask)
            h_update = inverse_reshape_irreps(m, hidden)
            if self.gate and gated.num_irreps > 0:
                # NequIP-style gate: the conv targets the UNIFORM-mul hidden
                # irreps (the uvu layout requirement); gate scalars are
                # produced from the update's own scalar channels, then the
                # standard e3nn Gate applies (scalars | gates | gated)
                sc_part = h_update[:, :n_scalar]
                gate_feats = nn.Dense(
                    gates.dim, kernel_init=torch_linear_kernel_init,
                    bias_init=torch_linear_bias_init(n_scalar),
                    name=f"gates_{i}")(sc_part)
                h_update = Gate(scalars, gates, gated)(
                    jnp.concatenate(
                        [sc_part, gate_feats, h_update[:, n_scalar:]],
                        axis=-1))
            elif self.gate:
                h_update = Activation(hidden, act="silu")(h_update)
            h = (h_update + pad_to_irreps(h, h_update.shape[-1])
                 if self.residual else h_update)

        out = POOL[self.pool](h, batch)
        out = out[:, : self.emb_dim]          # invariant scalar slice
        out = nn.Dense(self.emb_dim, kernel_init=torch_linear_kernel_init,
                       bias_init=torch_linear_bias_init(self.emb_dim))(out)
        out = nn.relu(out)
        return nn.Dense(self.out_dim, kernel_init=torch_linear_kernel_init,
                        bias_init=torch_linear_bias_init(self.emb_dim))(out)
