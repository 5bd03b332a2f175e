"""Production-shape MACE stack over the REAL interaction blocks.

The model zoo's MACEModel (models/mace.py) mirrors the reference research
config (/root/reference/models/mace.py:16-191): a per-edge FULLY-CONNECTED
tensor product whose weight tensor is O(E * mul^2 * n_paths) — fine at the
reference's ~1.2k-edge toy graphs, physically impossible at molecular-box
scale (>= 100k edges would need tens of GB per layer).

Production MACE (the force-field stacks the reference exports via
``interaction_classes``, mace_modules/__init__.py:32-38 /
blocks.py:396-530) instead uses the 'uvu' conv_tp with
O(E * n_paths * mul) weights.  This module assembles that stack:

    embed -> [ interaction (uvu conv) -> product basis (sym. contraction)
               -> per-layer linear readout ] x L -> summed graph energy

following the MACE paper's architecture (one scalar readout per layer,
summed), with the same GraphBatch contract as the zoo.  It is the scale
benchmark's MACE representative (scripts/bench_scale.py) and the model-level
consumer of the five interaction variants.

``edge_chunk`` bounds HBM at large E (see _InteractionBase._conv).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..irreps import Irreps
from ..nn.conv import EquivariantProductBasisBlock
from ..nn.equivariant import IrrepsLinear
from ..nn.mace_blocks import interaction_classes
from ..ops.norms import safe_norm
from ..ops.radial import radial_embedding
from ..ops.spherical import spherical_harmonics
from .pooling import POOL


class MACEForceField(nn.Module):
    """Energy model: ``model(batch) -> [G, 1]`` (sum of per-layer node
    energies, sum-pooled per graph)."""

    r_max: float = 5.0
    num_bessel: int = 8
    num_polynomial_cutoff: int = 5
    max_ell: int = 3
    correlation: int = 3
    num_layers: int = 2
    emb_dim: int = 64
    in_dim: int = 8                     # species count
    interaction: str = "RealAgnosticResidualInteractionBlock"
    interaction_first: str = "RealAgnosticResidualInteractionBlock"
    avg_num_neighbors: float = 12.0
    pool: str = "sum"
    edge_chunk: Optional[int] = None
    # node-block size for the per-node giants (symmetric contraction,
    # skip-FCTP); required at >=100k nodes (compile-time buffer planning)
    node_chunk: Optional[int] = 16384
    # exact-f32 einsum passes for the equivariant core (see
    # MACEModel.tp_precision); default on, matching the zoo MACE.
    tp_precision: Optional[str] = "highest"

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False):
        sh_irreps = Irreps.spherical_harmonics(self.max_ell)
        hidden = (sh_irreps * self.emb_dim).sort().simplify()
        attrs_irreps = Irreps(f"{self.in_dim}x0e")
        scalar_irreps = Irreps(f"{self.emb_dim}x0e")

        node_attrs = jax.nn.one_hot(batch.atoms, self.in_dim)
        h = IrrepsLinear(attrs_irreps, scalar_irreps, name="node_embedding")(
            node_attrs
        )

        vectors = batch.pos[batch.senders] - batch.pos[batch.receivers]
        lengths = safe_norm(vectors, axis=-1, keepdims=True)
        edge_sh = spherical_harmonics(vectors, self.max_ell)
        edge_feats = radial_embedding(
            lengths, self.r_max, self.num_bessel, self.num_polynomial_cutoff
        )

        energy = jnp.zeros((batch.num_graphs, 1), h.dtype)
        for i in range(self.num_layers):
            name = self.interaction_first if i == 0 else self.interaction
            nfi = scalar_irreps if i == 0 else hidden
            m, sc = interaction_classes[name](
                node_attrs_irreps=attrs_irreps,
                node_feats_irreps=nfi,
                edge_attrs_irreps=sh_irreps,
                edge_feats_irreps=Irreps(f"{self.num_bessel}x0e"),
                target_irreps=hidden,
                hidden_irreps=hidden,
                avg_num_neighbors=self.avg_num_neighbors,
                edge_chunk=self.edge_chunk,
                node_chunk=self.node_chunk,
                name=f"interaction_{i}",
            )(node_attrs, h, edge_sh, edge_feats, batch.senders,
              batch.receivers, batch.edge_mask)
            h = EquivariantProductBasisBlock(
                node_feats_irreps=hidden,
                target_irreps=hidden,
                correlation=self.correlation,
                use_sc=sc is not None,
                element_dependent=False,
                num_elements=self.in_dim,
                precision=self.tp_precision,
                node_chunk=self.node_chunk,
                name=f"product_{i}",
            )(m, sc, None)
            node_e = IrrepsLinear(hidden, Irreps("1x0e"),
                                  name=f"readout_{i}")(h)
            energy = energy + POOL[self.pool](node_e, batch)
        return energy
