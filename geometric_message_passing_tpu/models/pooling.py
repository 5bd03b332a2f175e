"""Graph-level readout functions over padded batches.

Equivalents of PyG global_add_pool / global_mean_pool and the fork's
first_node_pooling (/root/reference/models/tfn.py:13-40 — selects each
graph's first node, enabling node-level readout)."""

from __future__ import annotations


from ..graph import GraphBatch
from ..ops.scatter import segment_mean, segment_sum


def global_add_pool(x, batch: GraphBatch):
    return segment_sum(x, batch.graph_id, batch.num_graphs, mask=batch.node_mask)


def global_mean_pool(x, batch: GraphBatch):
    return segment_mean(x, batch.graph_id, batch.num_graphs, mask=batch.node_mask)


def first_node_pool(x, batch: GraphBatch):
    """x[first node of each graph] — precomputed index (host side) instead of
    the reference's shifted-batch-vector trick (tfn.py:38-40)."""
    return x[batch.first_node]


POOL = {
    "sum": global_add_pool,
    "add": global_add_pool,
    "mean": global_mean_pool,
    "first": first_node_pool,
}
