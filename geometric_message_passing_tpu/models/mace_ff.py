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
    # exact-f32 einsum passes for the equivariant core — the per-edge uvu
    # TP + post-conv linear inside each interaction block AND the
    # product-basis block (see MACEModel.tp_precision); default on,
    # matching the zoo MACE.
    tp_precision: Optional[str] = "highest"
    # mesh axis for edge-partitioned (gp) execution; set together with a
    # ``halo_plan`` argument at call time (see below).
    gp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False,
                 halo_plan=None):
        """Forward.  Single-device: ``model(batch) -> [G, 1]``.

        Edge-partitioned (gp, SURVEY §2.5 irrep-payload halo): called
        inside ``shard_map`` over a mesh with axis ``gp_axis``, with
        ``batch`` the LOCAL shard — node rows block-partitioned, edges
        living on their receiver's owner with ``senders`` holding CATALOG
        indices and ``receivers`` local rows (parallel.halo.build_halo_plan
        edge_src_cat / edge_tgt_local) — and ``halo_plan`` the device's
        slice of the plan arrays.  Per layer, ONE all_to_all moves the
        boundary nodes' full irreps row ([B, sum mul*(2l+1)] — the packed
        ragged payload); positions are exchanged once up front for the
        edge featurization.  The per-graph energies are psum-completed, so
        every device returns the full [G, 1].  Exactness vs the
        single-device forward (fwd + grads) is tested on a CPU mesh in
        tests/test_parallel.py."""
        from ..parallel.halo import halo_catalog

        gp = halo_plan is not None
        if gp:
            assert self.gp_axis is not None, "gp execution needs gp_axis"
            assert self.pool in ("sum", "add"), (
                "gp execution completes the pool with a psum — only the "
                "sum readout (the physical energy sum) distributes")
            exchange = lambda nf: halo_catalog(nf, halo_plan, self.gp_axis)
        else:
            exchange = None
        sh_irreps = Irreps.spherical_harmonics(self.max_ell)
        hidden = (sh_irreps * self.emb_dim).sort().simplify()
        attrs_irreps = Irreps(f"{self.in_dim}x0e")
        scalar_irreps = Irreps(f"{self.emb_dim}x0e")

        node_attrs = jax.nn.one_hot(batch.atoms, self.in_dim)
        h = IrrepsLinear(attrs_irreps, scalar_irreps, name="node_embedding")(
            node_attrs
        )

        if gp:
            pos_cat = halo_catalog(batch.pos, halo_plan, self.gp_axis)
            vectors = pos_cat[batch.senders] - batch.pos[batch.receivers]
        else:
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
                precision=self.tp_precision,
                name=f"interaction_{i}",
            )(node_attrs, h, edge_sh, edge_feats, batch.senders,
              batch.receivers, batch.edge_mask, halo_exchange=exchange)
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
        if gp:
            # nodes of one graph may span devices: complete the pool
            energy = jax.lax.psum(energy, axis_name=self.gp_axis)
        return energy
