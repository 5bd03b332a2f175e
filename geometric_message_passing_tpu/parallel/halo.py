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
