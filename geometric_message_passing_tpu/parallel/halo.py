"""Edge-partitioned graph parallelism ("gp") — the graph-world analog of
sequence/context parallelism (SURVEY §2.5): edges are sharded across chips,
node features live owner-partitioned, and each message-passing layer
exchanges node features across the mesh before local edge compute.

v0 exchange strategy: full halo —
    h_all  = all_gather(h_local)              # boundary superset, ICI
    msg    = f(h_all[receivers], h_all[senders], edge_feats)   # local edges
    partial= segment_sum(msg -> global node ids)
    h_out  = psum_scatter(partial)            # reduce-scatter back to owners
all_gather + psum_scatter are the bandwidth-optimal pair for this pattern on
a ring; a boundary-only packed halo is a later optimization (most synthetic
graphs here have boundary == everything anyway).

Equivalence with the single-device program is tested on a CPU mesh in
tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.scatter import segment_sum
from .mesh import collectives


def gp_gather_nodes(h_local, axis: str = "gp"):
    """Owner-partitioned [N_local, d] -> replicated [N_total, d]."""
    return collectives.all_gather(h_local, axis, tiled=True)


def gp_scatter_nodes(partial_global, axis: str = "gp"):
    """Per-device partial sums over ALL nodes [N_total, d] -> reduced local
    shard [N_local, d] (reduce-scatter)."""
    return jax.lax.psum_scatter(partial_global, axis_name=axis,
                                scatter_dimension=0, tiled=True)


import numpy as np
from flax import struct


@struct.dataclass
class HaloPlan:
    """Host-precomputed plan for a PACKED boundary-only halo exchange.

    Nodes are block-partitioned (device p owns rows [p*n_local, (p+1)*n_local));
    edges live on the owner of their aggregation target, so only the GATHER
    side needs communication.  For each device pair (p -> q), ``send_idx[p,q]``
    lists the LOCAL rows of p that q's edges reference, padded to the max
    boundary size B.  One all_to_all moves exactly the boundary payload
    (k*B*d floats) instead of the full node set — the packed upgrade over the
    all_gather v0 above.  Every leading-[k] array is sharded over the mesh
    axis with in_spec P(axis).

    Edges are ALSO split into INTERIOR (source owned locally) and BOUNDARY
    (source arrives in the payload): interior message compute has no data
    dependency on the collective, so XLA's latency-hiding scheduler overlaps
    it with the all_to_all (``packed_halo_aggregate_overlapped`` — the
    comm/compute overlap mandated by SURVEY §2.5).  The combined
    ``edge_src_cat`` catalog form is kept for the non-overlapped variant.
    """

    n_local: int = struct.field(pytree_node=False)
    send_idx: jnp.ndarray      # [k, k, B] int32 local rows to send to peer q
    send_mask: jnp.ndarray     # [k, k, B] bool
    edge_src_cat: jnp.ndarray  # [k, E_loc] catalog index of each edge's source
    edge_tgt_local: jnp.ndarray  # [k, E_loc] local index of the target
    edge_mask: jnp.ndarray     # [k, E_loc] bool
    int_src: jnp.ndarray       # [k, E_int] local row of interior edge source
    int_tgt: jnp.ndarray       # [k, E_int] local row of interior edge target
    int_mask: jnp.ndarray      # [k, E_int] bool
    bnd_src_slot: jnp.ndarray  # [k, E_bnd] payload slot (p*B + s) of source
    bnd_tgt: jnp.ndarray       # [k, E_bnd] local row of boundary edge target
    bnd_mask: jnp.ndarray      # [k, E_bnd] bool
    edge_perm: jnp.ndarray     # [k, E_loc] ORIGINAL edge id of each slot
    #                            (0 on pad slots) — shards any per-edge array
    #                            x into the plan's layout via x[edge_perm]


def build_halo_plan(senders, receivers, num_nodes: int, k: int,
                    edge_mask=None) -> HaloPlan:
    """Partition a graph for packed-halo execution (host-side, numpy).

    Aggregation target = receiver (the framework's message direction); the
    source side is gathered, possibly remotely.  ``num_nodes`` must be a
    multiple of k (pad the graph first).
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    e = senders.shape[0]
    emask = (np.ones(e, bool) if edge_mask is None
             else np.asarray(edge_mask, bool))
    assert num_nodes % k == 0, (num_nodes, k)
    n_local = num_nodes // k
    owner_s = senders // n_local
    owner_t = receivers // n_local

    # per-pair boundary sets: device q needs src nodes owned by p != q
    need = [[np.zeros(0, np.int64) for _ in range(k)] for _ in range(k)]
    for q in range(k):
        on_q = emask & (owner_t == q)
        for p in range(k):
            if p == q:
                continue
            sel = on_q & (owner_s == p)
            need[p][q] = np.unique(senders[sel])
    b = max((arr.size for row in need for arr in row), default=0)
    b = max(b, 1)

    send_idx = np.zeros((k, k, b), np.int32)
    send_mask = np.zeros((k, k, b), bool)
    # catalog on device q: rows [0, n_local) local, then [n_local + p*b + s]
    # = slot s of the payload received from device p
    slot_of = {}   # (q, global_node) -> catalog index on q
    for p in range(k):
        for q in range(k):
            ids = need[p][q]
            send_idx[p, q, : ids.size] = ids - p * n_local
            send_mask[p, q, : ids.size] = True
            for s, g in enumerate(ids):
                slot_of[(q, int(g))] = n_local + p * b + s

    e_loc = max(int(np.max(np.bincount(owner_t[emask], minlength=k))), 1) \
        if emask.any() else 1
    edge_src_cat = np.zeros((k, e_loc), np.int32)
    edge_tgt_local = np.zeros((k, e_loc), np.int32)
    edge_mask_out = np.zeros((k, e_loc), bool)
    edge_perm = np.zeros((k, e_loc), np.int32)
    # interior/boundary split (overlapped variant)
    n_int = np.bincount(owner_t[emask & (owner_s == owner_t)], minlength=k)
    n_bnd = np.bincount(owner_t[emask & (owner_s != owner_t)], minlength=k)
    e_int = max(int(n_int.max()) if n_int.size else 0, 1)
    e_bnd = max(int(n_bnd.max()) if n_bnd.size else 0, 1)
    int_src = np.zeros((k, e_int), np.int32)
    int_tgt = np.zeros((k, e_int), np.int32)
    int_mask = np.zeros((k, e_int), bool)
    bnd_src_slot = np.zeros((k, e_bnd), np.int32)
    bnd_tgt = np.zeros((k, e_bnd), np.int32)
    bnd_mask = np.zeros((k, e_bnd), bool)
    fill = np.zeros(k, np.int32)
    fill_i = np.zeros(k, np.int32)
    fill_b = np.zeros(k, np.int32)
    for i in range(e):
        if not emask[i]:
            continue
        q = int(owner_t[i])
        j = int(fill[q]); fill[q] += 1
        tgt = int(receivers[i]) - q * n_local
        src_owner = int(owner_s[i])
        if src_owner == q:
            cat = int(senders[i]) - q * n_local
            ji = int(fill_i[q]); fill_i[q] += 1
            int_src[q, ji] = cat
            int_tgt[q, ji] = tgt
            int_mask[q, ji] = True
        else:
            cat = slot_of[(q, int(senders[i]))]
            jb = int(fill_b[q]); fill_b[q] += 1
            bnd_src_slot[q, jb] = cat - n_local   # payload-relative index
            bnd_tgt[q, jb] = tgt
            bnd_mask[q, jb] = True
        edge_src_cat[q, j] = cat
        edge_tgt_local[q, j] = tgt
        edge_mask_out[q, j] = True
        edge_perm[q, j] = i

    return HaloPlan(
        n_local=n_local,
        send_idx=jnp.asarray(send_idx),
        send_mask=jnp.asarray(send_mask),
        edge_src_cat=jnp.asarray(edge_src_cat),
        edge_tgt_local=jnp.asarray(edge_tgt_local),
        edge_mask=jnp.asarray(edge_mask_out),
        int_src=jnp.asarray(int_src),
        int_tgt=jnp.asarray(int_tgt),
        int_mask=jnp.asarray(int_mask),
        bnd_src_slot=jnp.asarray(bnd_src_slot),
        bnd_tgt=jnp.asarray(bnd_tgt),
        bnd_mask=jnp.asarray(bnd_mask),
        edge_perm=jnp.asarray(edge_perm),
    )


def halo_catalog(h_local, plan_local, axis: str = "gp"):
    """Exchange the boundary payload and return the gather catalog
    [n_local + k*B, d]: rows [0, n_local) are this device's own nodes, row
    n_local + p*B + s is slot s received from device p.  ``edge_src_cat``
    indexes directly into this catalog.

    This is the payload-only half of ``packed_halo_aggregate`` — exposed so
    model layers whose message needs MORE than (h_tgt, h_src) (per-edge
    spherical harmonics, radial features, TP weights ...) can run their own
    edge compute over the catalog.  The payload width d is arbitrary: for
    equivariant models it is the FLAT irrep feature row (sum mul*(2l+1)
    floats — the fixed-width packing of the ragged irrep payload the SURVEY
    §2.5 halo mandate calls for; flattening the irrep blocks into one row
    IS the packing, done once at model build)."""
    if plan_local["send_idx"].ndim == 3:
        plan_local = jax.tree.map(lambda x: x[0], plan_local)
    send_idx, send_mask = plan_local["send_idx"], plan_local["send_mask"]
    k, b = send_idx.shape
    payload = h_local[send_idx] * send_mask[..., None].astype(h_local.dtype)
    recv = collectives.all_to_all(payload, axis, 0, 0)     # [k, B, d]
    return jnp.concatenate(
        [h_local, recv.reshape(k * b, h_local.shape[-1])], axis=0
    )


def halo_stats(plan: HaloPlan, payload_dim: int, dtype_bytes: int = 4,
               num_nodes: int | None = None) -> dict:
    """Communication accounting for one packed halo exchange of a
    [*, payload_dim] payload, vs the all_gather v0 alternative.

    Returns per-device-per-exchange numbers: ``wire_bytes`` counts only
    slots that actually cross chips ((k-1) peer blocks of B slots each,
    padded — what the all_to_all puts on ICI); ``useful_bytes`` counts the
    unpadded boundary rows (send_mask); ``allgather_bytes`` is what the v0
    full-gather strategy would move ((N - n_local) rows in)."""
    import numpy as _np

    send_mask = _np.asarray(plan.send_mask)
    k, _, b = send_mask.shape
    n = num_nodes if num_nodes is not None else k * plan.n_local
    off_diag = send_mask.sum() - sum(send_mask[p, p].sum() for p in range(k))
    return {
        "k": k,
        "slots_per_pair": b,
        "payload_dim": payload_dim,
        "wire_bytes": (k - 1) * b * payload_dim * dtype_bytes,
        "useful_bytes": int(off_diag) * payload_dim * dtype_bytes // k,
        "allgather_bytes": (n - plan.n_local) * payload_dim * dtype_bytes,
    }


def packed_halo_aggregate(h_local, plan_local, message_fn, axis: str = "gp"):
    """One packed-halo message round (device-side, inside shard_map).

    plan_local: this device's slice of the HaloPlan arrays (leading [k] axis
    sharded, i.e. send_idx [k, B], edge_src_cat [E_loc], ...).

    Exchange the boundary payload with ONE all_to_all, build the catalog
    [n_local + k*B, d], then gather -> message -> masked segment-sum onto
    local targets.  No reverse scatter: edges live with their targets.
    """
    if plan_local["send_idx"].ndim == 3:
        # arrays arrive from shard_map with a leading singleton shard axis
        plan_local = jax.tree.map(lambda x: x[0], plan_local)
    send_idx, send_mask = plan_local["send_idx"], plan_local["send_mask"]
    k, b = send_idx.shape
    payload = h_local[send_idx] * send_mask[..., None].astype(h_local.dtype)
    recv = collectives.all_to_all(payload, axis, 0, 0)     # [k, B, d]
    catalog = jnp.concatenate(
        [h_local, recv.reshape(k * b, h_local.shape[-1])], axis=0
    )
    h_src = catalog[plan_local["edge_src_cat"]]
    h_tgt = h_local[plan_local["edge_tgt_local"]]
    msg = message_fn(h_tgt, h_src)
    return segment_sum(msg, plan_local["edge_tgt_local"], h_local.shape[0],
                       mask=plan_local["edge_mask"])


def packed_halo_aggregate_overlapped(h_local, plan_local, message_fn,
                                     axis: str = "gp"):
    """Packed halo round with comm/compute OVERLAP (SURVEY §2.5: halo
    exchange "overlapped with local aggregation").

    Interior edges (source owned locally) are computed and accumulated with
    NO data dependency on the all_to_all, so XLA's latency-hiding scheduler
    runs the collective concurrently with the interior gather -> message ->
    segment-sum; boundary edges consume the received payload afterwards.
    Numerically identical to ``packed_halo_aggregate`` (same masked sums,
    reordered additions)."""
    if plan_local["send_idx"].ndim == 3:
        plan_local = jax.tree.map(lambda x: x[0], plan_local)
    send_idx, send_mask = plan_local["send_idx"], plan_local["send_mask"]
    k, b = send_idx.shape
    payload = h_local[send_idx] * send_mask[..., None].astype(h_local.dtype)
    recv = collectives.all_to_all(payload, axis, 0, 0)     # [k, B, d] async
    # interior: independent of recv — overlaps with the collective
    msg_int = message_fn(h_local[plan_local["int_tgt"]],
                         h_local[plan_local["int_src"]])
    acc = segment_sum(msg_int, plan_local["int_tgt"], h_local.shape[0],
                      mask=plan_local["int_mask"])
    # boundary: consumes the payload
    flat = recv.reshape(k * b, h_local.shape[-1])
    msg_bnd = message_fn(h_local[plan_local["bnd_tgt"]],
                         flat[plan_local["bnd_src_slot"]])
    return acc + segment_sum(msg_bnd, plan_local["bnd_tgt"],
                             h_local.shape[0],
                             mask=plan_local["bnd_mask"])


def gp_local_batch(batch, plan: HaloPlan):
    """Rewrite a padded GraphBatch into the plan's edge-partitioned layout:
    senders become CATALOG indices (edge_src_cat), receivers/edge_mask the
    plan's per-owner slots, flattened to [k*E_loc] so every edge field
    shards with in_spec P(axis) alongside the node fields ([N] with N a
    multiple of k).  Graph-level fields (y, graph_mask, first_node) stay
    replicated — use P() for them.  Pair with in-model halo execution
    (e.g. MACEForceField(gp_axis=...) called with halo_plan)."""
    return batch.replace(
        senders=plan.edge_src_cat.reshape(-1),
        receivers=plan.edge_tgt_local.reshape(-1),
        edge_mask=plan.edge_mask.reshape(-1),
    )


def gp_edge_aggregate(
    h_local,
    senders,          # [E_local] global node ids (this device's edge shard)
    receivers,        # [E_local]
    edge_mask,        # [E_local]
    message_fn: Callable,   # (h_i, h_j) -> msg  (i=receiver/target side)
    num_nodes_total: int,
    axis: str = "gp",
):
    """One halo-exchanged gather->message->scatter round.

    Aggregation direction matches the layers built on it (messages scattered
    to the receiver/target index).
    """
    h_all = gp_gather_nodes(h_local, axis)
    msg = message_fn(h_all[receivers], h_all[senders])
    partial = segment_sum(msg, receivers, num_nodes_total, mask=edge_mask)
    return gp_scatter_nodes(partial, axis)


def gp_egnn_layer(layer, variables, h_local, pos_local, plan_local,
                  axis: str = "gp", train: bool = False):
    """Edge-partitioned forward of a REAL model layer: one EGNNLayer over
    the packed halo (node payload = [h, pos]; the scatter-mean denominator
    for the position update rides the message as a count channel).

    Semantics match the single-device layer exactly for aggr='sum'/'add'
    (the model default): h' = update(h, sum_j msg), x' = x + mean_j pos_msg.
    Equivalence is tested on a CPU mesh in tests/test_parallel.py.
    """
    from ..ops.norms import safe_norm

    d = h_local.shape[-1]
    payload = jnp.concatenate([h_local, pos_local], axis=-1)

    def message_fn(tgt, src):
        h_i, pos_i = tgt[..., :d], tgt[..., d:]
        h_j, pos_j = src[..., :d], src[..., d:]
        pos_diff = pos_i - pos_j
        dists = safe_norm(pos_diff, axis=-1, keepdims=True)
        msg, scale = layer.apply(variables, h_i, h_j, dists, train,
                                 method="message")
        return jnp.concatenate(
            [msg, pos_diff * scale, jnp.ones_like(dists)], axis=-1)

    agg = packed_halo_aggregate(payload, plan_local, message_fn, axis)
    msg_aggr = agg[..., :-4]
    cnt = jnp.maximum(agg[..., -1:], 1.0)        # segment_mean clamp
    pos_aggr = agg[..., -4:-1] / cnt
    upd = layer.apply(variables, h_local, msg_aggr, train, method="update")
    return upd, pos_local + pos_aggr
