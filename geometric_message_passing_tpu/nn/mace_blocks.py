"""Full MACE block library — redesign of
/root/reference/models/mace_modules/blocks.py (the parts beyond what the
model zoo itself uses: readout/embedding blocks, the five interaction-block
variants and their registry, scale-shift, atomic energies).

The reference exports these via ``mace_modules.interaction_classes``
(mace_modules/__init__.py:32-38); they are the building blocks of full
MACE/BOTNet force-field stacks.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..irreps import Irreps
from ..ops.scatter import segment_sum, segment_sum_into
from .basic import ACT
from .equivariant import (
    Activation,
    IrrepsLinear,
    _act_second_moment,
    reshape_irreps,
)
from .tensor_product import EdgeTensorProductUVU, FullyConnectedTensorProduct


class E3FullyConnectedNet(nn.Module):
    """e3nn nn.FullyConnectedNet numerics: y = act(x @ W / sqrt(fan_in)),
    W ~ N(0,1), activation rescaled to unit second moment; no bias."""

    widths: Sequence[int]        # hidden + output widths
    act: str = "silu"

    @nn.compact
    def __call__(self, x):
        n = len(self.widths)
        for i, w in enumerate(self.widths):
            W = self.param(f"w{i}", nn.initializers.normal(stddev=1.0),
                           (x.shape[-1], w))
            x = x @ (W / math.sqrt(x.shape[-1]))
            if i < n - 1:
                x = ACT[self.act](x) * _act_second_moment(self.act)
        return x


class LinearNodeEmbeddingBlock(nn.Module):
    """o3.Linear on node attributes (blocks.py:26-34)."""

    irreps_in: Irreps
    irreps_out: Irreps

    @nn.compact
    def __call__(self, node_attrs):
        return IrrepsLinear(Irreps(self.irreps_in), Irreps(self.irreps_out))(
            node_attrs
        )


class LinearReadoutBlock(nn.Module):
    """o3.Linear readout to (default) a single scalar (blocks.py:37-43)."""

    irreps_in: Irreps
    irreps_out: Irreps = Irreps("1x0e")

    @nn.compact
    def __call__(self, x):
        return IrrepsLinear(Irreps(self.irreps_in), Irreps(self.irreps_out))(x)


class NonLinearReadoutBlock(nn.Module):
    """Linear -> scalar activation -> Linear (blocks.py:46-59)."""

    irreps_in: Irreps
    mlp_irreps: Irreps
    gate: str = "silu"
    irreps_out: Irreps = Irreps("1x0e")

    @nn.compact
    def __call__(self, x):
        hidden = Irreps(self.mlp_irreps)
        x = IrrepsLinear(Irreps(self.irreps_in), hidden)(x)
        x = Activation(hidden, act=self.gate)(x)
        return IrrepsLinear(hidden, Irreps(self.irreps_out))(x)


class AtomicEnergiesBlock(nn.Module):
    """Fixed per-element reference energies (blocks.py:62-81)."""

    atomic_energies: Tuple[float, ...]

    @nn.compact
    def __call__(self, one_hot):
        e = jnp.asarray(np.asarray(self.atomic_energies), dtype=one_hot.dtype)
        return one_hot @ e


class ScaleShiftBlock(nn.Module):
    """y = scale * x + shift (blocks.py:533-549)."""

    scale: float
    shift: float

    def __call__(self, x):
        return self.scale * x + self.shift


class TensorProductWeightsBlock(nn.Module):
    """Element-dependent TP weights: einsum('be,ba,aek->bk') with xavier
    init (blocks.py:179-203)."""

    num_elements: int
    num_edge_feats: int
    num_feats_out: int

    @nn.compact
    def __call__(self, node_attrs_one_hot, edge_feats):
        W = self.param(
            "weights",
            nn.initializers.glorot_uniform(batch_axis=(0,)),
            (self.num_elements, self.num_edge_feats, self.num_feats_out),
        )
        return jnp.einsum("be,ba,aek->bk", edge_feats, node_attrs_one_hot, W)


class _InteractionBase(nn.Module):
    """Shared config of all interaction variants (blocks.py:138-173)."""

    node_attrs_irreps: Irreps
    node_feats_irreps: Irreps
    edge_attrs_irreps: Irreps
    edge_feats_irreps: Irreps
    target_irreps: Irreps
    hidden_irreps: Irreps
    avg_num_neighbors: float = 1.0
    # Process the edge axis in chunks of this many edges (round 3, the
    # >=100k-edge molecular-box regime): the per-edge TP weights and the
    # combined-CG intermediate are O(E * weight_numel) / O(E * u * M)
    # floats — tens of GB at 1M edges.  Chunking runs gather -> weight MLP
    # -> uvu TP -> masked segment-sum per chunk inside an nn.scan with a
    # rematerialized body, so the working set is ONE chunk of per-edge
    # intermediates plus the [n, out] accumulator (fwd AND bwd).  None =
    # single-pass (identical numerics up to sum reassociation).
    edge_chunk: Optional[int] = None
    # node-block size for the skip-FCTP (see FullyConnectedTensorProduct.
    # node_chunk) — the other node-level giant at >=100k nodes.
    node_chunk: Optional[int] = None
    # exact-f32 einsum passes for the per-edge TP + post-conv linear (the
    # precision-sensitive stage identified by the round-3 MACE ablation,
    # RESULTS.md); None = fast single-pass bf16 MXU numerics.
    precision: Optional[str] = None
    # accumulator-element threshold above which the post-conv linear is
    # folded into the edge chunks (see _conv); class-level so tests can
    # force the fold path at toy sizes.
    FOLD_ACC_ELEMS = 2 ** 28

    def _conv(self, tp, node_feats, edge_attrs, edge_feats, senders,
              receivers, edge_mask, num_nodes, widths=(64, 64, 64),
              post=None, post_dim=None):
        """gather -> weight MLP -> weighted TP -> masked segment-sum,
        optionally edge-chunked.  The weight net is CONSTRUCTED inside the
        (possibly lifted) body under a fixed name, so both modes create
        identical parameter trees (flax lifted transforms cannot close over
        submodules — modules must be built inside the transformed fn)."""
        E = senders.shape[0]
        C = self.edge_chunk
        all_w = widths + (tp.weight_numel,)
        if C is None or E <= C:
            tp_w = E3FullyConnectedNet(all_w, name="conv_tp_weights")(
                edge_feats)
            mji = tp.apply(node_feats[senders], edge_attrs, tp_w)
            out = segment_sum(mji, receivers, num_nodes, mask=edge_mask)
            return post(out) if post is not None else out
        # Fold the post-conv linear into each chunk when the [N,
        # tp.irreps_out.dim] accumulator would itself be a giant (~3.8 GB
        # at 100k nodes, lmax 3, 64 channels — fails compile-time buffer
        # planning): linear commutes with segment-sum, so applying it
        # per-edge inside the chunk is EXACT and shrinks the accumulator
        # to the target width, at ~avg_degree x the linear FLOPs (GEMMs —
        # cheap next to the TP).  ``post`` is built by the caller with a
        # FIXED submodule name so parameter trees match the unfolded path.
        fold = (post is not None
                and num_nodes * tp.irreps_out.dim > self.FOLD_ACC_ELEMS)
        n_chunks = -(-E // C)
        pad = n_chunks * C - E
        mask = edge_mask if edge_mask is not None else jnp.ones(E, bool)

        def pad_to(x, fill):
            if not pad:
                return x
            tail = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([x, tail], axis=0)

        xs = (
            pad_to(senders, 0).reshape(n_chunks, C),
            pad_to(receivers, 0).reshape(n_chunks, C),
            pad_to(edge_attrs, 0).reshape((n_chunks, C) +
                                          edge_attrs.shape[1:]),
            pad_to(edge_feats, 0).reshape((n_chunks, C) +
                                          edge_feats.shape[1:]),
            pad_to(mask, False).reshape(n_chunks, C),
        )

        def body(mdl, acc, x):
            s, r, ea, ef, m = x
            w = E3FullyConnectedNet(all_w, name="conv_tp_weights")(ef)
            # node_feats is a CLOSURE constant, not part of the carry:
            # lax.scan's vjp saves the carry PER ITERATION, so carrying
            # the [N, hidden] table materialized an
            # [n_chunks, N, hidden] cotangent stack (33 GB at 100k nodes
            # — the compile-killer); a closed-over invariant gets ONE
            # summed cotangent instead.
            mji = tp.apply(node_feats[s], ea, w)
            if fold:
                mji = post(mji)
            return segment_sum_into(acc, mji, r, mask=m), ()

        body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False})
        out_dim = post_dim if fold else tp.irreps_out.dim
        acc0 = jnp.zeros((num_nodes, out_dim), node_feats.dtype)
        acc, _ = scan(self, acc0, xs)
        if fold:
            return acc
        return post(acc) if post is not None else acc

    def _tp(self):
        return EdgeTensorProductUVU(
            Irreps(self.node_feats_irreps), Irreps(self.edge_attrs_irreps),
            Irreps(self.target_irreps), precision=self.precision,
        )

    def _linear_out_irreps(self, irreps_mid: Irreps) -> Irreps:
        """linear_out_irreps semantics (irreps_tools.py:45-60): for each
        distinct irrep in mid, the target multiplicity."""
        target = Irreps(self.target_irreps)
        out = []
        for _, ir in irreps_mid.simplify():
            found = [(mul, t) for mul, t in target if t == ir]
            if not found:
                raise ValueError(f"{ir} not in {target}")
            out.append(found[0])
        return Irreps(out).simplify()


class ResidualElementDependentInteractionBlock(_InteractionBase):
    """blocks.py:206-265."""

    @nn.compact
    def __call__(self, node_attrs, node_feats, edge_attrs, edge_feats,
                 senders, receivers, edge_mask=None):
        nfi = Irreps(self.node_feats_irreps)
        num_nodes = node_feats.shape[0]
        tp = self._tp()
        irreps_out = self._linear_out_irreps(tp.irreps_out)
        sc = FullyConnectedTensorProduct(
            nfi, Irreps(self.node_attrs_irreps), irreps_out, name="skip_tp",
        )(node_feats, node_attrs)
        node_feats = IrrepsLinear(nfi, nfi, name="linear_up")(node_feats)
        tp_w = TensorProductWeightsBlock(
            Irreps(self.node_attrs_irreps).num_irreps,
            Irreps(self.edge_feats_irreps).num_irreps,
            tp.weight_numel, name="conv_tp_weights",
        )(node_attrs[senders], edge_feats)
        mji = tp.apply(node_feats[senders], edge_attrs, tp_w)
        message = segment_sum(mji, receivers, num_nodes, mask=edge_mask)
        message = IrrepsLinear(tp.irreps_out, irreps_out, name="linear")(
            message
        ) / self.avg_num_neighbors
        return message + sc


class AgnosticNonlinearInteractionBlock(_InteractionBase):
    """blocks.py:268-328."""

    @nn.compact
    def __call__(self, node_attrs, node_feats, edge_attrs, edge_feats,
                 senders, receivers, edge_mask=None):
        nfi = Irreps(self.node_feats_irreps)
        num_nodes = node_feats.shape[0]
        tp = self._tp()
        irreps_out = self._linear_out_irreps(tp.irreps_out)
        tp_w = E3FullyConnectedNet(
            (64, 64, 64, tp.weight_numel), name="conv_tp_weights",
        )(edge_feats)
        node_feats = IrrepsLinear(nfi, nfi, name="linear_up")(node_feats)
        mji = tp.apply(node_feats[senders], edge_attrs, tp_w)
        message = segment_sum(mji, receivers, num_nodes, mask=edge_mask)
        message = IrrepsLinear(tp.irreps_out, irreps_out, name="linear")(
            message
        ) / self.avg_num_neighbors
        return FullyConnectedTensorProduct(
            irreps_out, Irreps(self.node_attrs_irreps), irreps_out,
            name="skip_tp",
        )(message, node_attrs)


class AgnosticResidualNonlinearInteractionBlock(_InteractionBase):
    """blocks.py:331-393."""

    @nn.compact
    def __call__(self, node_attrs, node_feats, edge_attrs, edge_feats,
                 senders, receivers, edge_mask=None):
        nfi = Irreps(self.node_feats_irreps)
        num_nodes = node_feats.shape[0]
        tp = self._tp()
        irreps_out = self._linear_out_irreps(tp.irreps_out)
        sc = FullyConnectedTensorProduct(
            nfi, Irreps(self.node_attrs_irreps), irreps_out, name="skip_tp",
        )(node_feats, node_attrs)
        node_feats = IrrepsLinear(nfi, nfi, name="linear_up")(node_feats)
        tp_w = E3FullyConnectedNet(
            (64, 64, 64, tp.weight_numel), name="conv_tp_weights",
        )(edge_feats)
        mji = tp.apply(node_feats[senders], edge_attrs, tp_w)
        message = segment_sum(mji, receivers, num_nodes, mask=edge_mask)
        message = IrrepsLinear(tp.irreps_out, irreps_out, name="linear")(
            message
        ) / self.avg_num_neighbors
        return message + sc


class RealAgnosticInteractionBlock(_InteractionBase):
    """blocks.py:396-461 — returns ([n, channels, (lmax+1)^2], None).

    ``halo_exchange``: optional callable for edge-partitioned (gp)
    execution — maps the post-linear_up LOCAL node features [N_loc, D] to
    the gather catalog [N_loc + k*B, D] (see parallel.halo.halo_catalog);
    ``senders`` then index the catalog while ``receivers``/segment targets
    stay local.  None = single-device semantics (identical numerics)."""

    @nn.compact
    def __call__(self, node_attrs, node_feats, edge_attrs, edge_feats,
                 senders, receivers, edge_mask=None, halo_exchange=None):
        nfi = Irreps(self.node_feats_irreps)
        num_nodes = node_feats.shape[0]
        tp = self._tp()
        irreps_out = Irreps(self.target_irreps)
        node_feats = IrrepsLinear(nfi, nfi, name="linear_up")(node_feats)
        if halo_exchange is not None:
            node_feats = halo_exchange(node_feats)
        message = self._conv(
            tp, node_feats, edge_attrs, edge_feats, senders, receivers,
            edge_mask, num_nodes,
            post=lambda m: IrrepsLinear(tp.irreps_out, irreps_out,
                                        precision=self.precision,
                                        name="linear")(m),
            post_dim=irreps_out.dim,
        ) / self.avg_num_neighbors
        message = FullyConnectedTensorProduct(
            irreps_out, Irreps(self.node_attrs_irreps), irreps_out,
            node_chunk=self.node_chunk, name="skip_tp",
        )(message, node_attrs)
        return reshape_irreps(message, irreps_out), None


class RealAgnosticResidualInteractionBlock(_InteractionBase):
    """blocks.py:464-530 — returns ([n, channels, (lmax+1)^2], sc).

    ``halo_exchange``: see RealAgnosticInteractionBlock — the self
    connection (skip_tp) and segment targets are node-local, only the
    post-linear_up gather side crosses chips."""

    @nn.compact
    def __call__(self, node_attrs, node_feats, edge_attrs, edge_feats,
                 senders, receivers, edge_mask=None, halo_exchange=None):
        nfi = Irreps(self.node_feats_irreps)
        num_nodes = node_feats.shape[0]
        tp = self._tp()
        irreps_out = Irreps(self.target_irreps)
        sc = FullyConnectedTensorProduct(
            nfi, Irreps(self.node_attrs_irreps), Irreps(self.hidden_irreps),
            node_chunk=self.node_chunk, name="skip_tp",
        )(node_feats, node_attrs)
        node_feats = IrrepsLinear(nfi, nfi, name="linear_up")(node_feats)
        if halo_exchange is not None:
            node_feats = halo_exchange(node_feats)
        message = self._conv(
            tp, node_feats, edge_attrs, edge_feats, senders, receivers,
            edge_mask, num_nodes,
            post=lambda m: IrrepsLinear(tp.irreps_out, irreps_out,
                                        precision=self.precision,
                                        name="linear")(m),
            post_dim=irreps_out.dim,
        ) / self.avg_num_neighbors
        return reshape_irreps(message, irreps_out), sc


interaction_classes = {
    "AgnosticNonlinearInteractionBlock": AgnosticNonlinearInteractionBlock,
    "ResidualElementDependentInteractionBlock":
        ResidualElementDependentInteractionBlock,
    "AgnosticResidualNonlinearInteractionBlock":
        AgnosticResidualNonlinearInteractionBlock,
    "RealAgnosticResidualInteractionBlock":
        RealAgnosticResidualInteractionBlock,
    "RealAgnosticInteractionBlock": RealAgnosticInteractionBlock,
}

gate_dict = {"abs": "abs", "tanh": "tanh", "silu": "silu", "None": None}
