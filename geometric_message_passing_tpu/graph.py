"""Static-shape graph batch container — the TPU-native replacement for PyG's
dynamic ``Batch`` (block-diagonal concatenation, reference
``experiments/graph_angle_prediction.py:122-124``).

XLA requires static shapes: a ``GraphBatch`` is always padded to fixed
(num_nodes, num_edges, num_graphs) bucket sizes chosen per dataset.  Padding
discipline:
  * pad nodes/edges are appended at the end and masked out;
  * pad edges connect pad-node -> pad-node so gathers stay in bounds;
  * pad nodes belong to a trailing pad graph so segment pooling stays correct;
  * per-graph targets carry a ``graph_mask``.

The container is a registered JAX pytree (flax.struct), so it flows through
jit/pjit/shard_map directly and can be sharded along the edge/node/graph axes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TripletData:
    """Static-shape triplet (and optional quad) index structure for
    directional models (DimeNet++/SphereNet).  T = padded triplet count,
    Q = padded quad count.  Built host-side (structure only, positions are
    gathered in-graph) — replaces torch_sparse CSR slicing at
    /root/reference/models/layers/spherenet_layer.py:511-525."""

    idx_i: jnp.ndarray          # [T] node i of triplet k->j->i
    idx_j: jnp.ndarray          # [T]
    idx_k: jnp.ndarray          # [T]
    idx_kj: jnp.ndarray         # [T] edge id of k->j
    idx_ji: jnp.ndarray         # [T] edge id of j->i
    t_mask: jnp.ndarray         # [T] bool
    q_trip: Optional[jnp.ndarray] = None   # [Q] triplet id of each quad
    q_kn: Optional[jnp.ndarray] = None     # [Q] node id of the 4th point k_n
    q_mask: Optional[jnp.ndarray] = None   # [Q] bool

    @property
    def num_triplets(self) -> int:
        return self.idx_i.shape[0]


@struct.dataclass
class GraphBatch:
    """A batch of graphs padded to static shapes.

    Shapes: N = padded node count, E = padded edge count, G = padded graph count.
    """

    atoms: jnp.ndarray          # [N] int32 node type labels
    pos: jnp.ndarray            # [N, 3] float positions
    senders: jnp.ndarray        # [E] int32 source node of each edge (edge_index[0])
    receivers: jnp.ndarray      # [E] int32 destination node (edge_index[1])
    graph_id: jnp.ndarray       # [N] int32 graph each node belongs to
    y: jnp.ndarray              # [G, y_dim] targets (float) or [G] int labels
    node_mask: jnp.ndarray      # [N] bool
    edge_mask: jnp.ndarray      # [E] bool
    graph_mask: jnp.ndarray     # [G] bool
    first_node: jnp.ndarray     # [G] int32 index of each graph's first node
    triplets: Optional[TripletData] = None

    @property
    def num_nodes(self) -> int:
        return self.atoms.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]


class Graph:
    """A single host-side graph (numpy). Mirrors the fields of a PyG ``Data``
    object as produced by the reference generators
    (/root/reference/experiments/utils/create_graphs.py:78)."""

    __slots__ = ("atoms", "edge_index", "pos", "y")

    def __init__(self, atoms, edge_index, pos, y):
        self.atoms = np.asarray(atoms, dtype=np.int32)
        self.edge_index = np.asarray(edge_index, dtype=np.int32)  # [2, e]
        self.pos = np.asarray(pos, dtype=np.float32)
        self.y = np.asarray(y)

    @property
    def num_nodes(self) -> int:
        return self.atoms.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_index.shape[1]


def to_undirected(edge_index: np.ndarray) -> np.ndarray:
    """Symmetrize and deduplicate edges; sorted (row-major) like PyG's
    ``to_undirected`` (used at create_graphs.py:79)."""
    src = np.concatenate([edge_index[0], edge_index[1]])
    dst = np.concatenate([edge_index[1], edge_index[0]])
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    return pairs.T.astype(np.int32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_sizes(
    graphs: Sequence[Graph],
    batch_size: int,
    node_multiple: int = 8,
    edge_multiple: int = 128,
):
    """Choose bucket sizes covering any ``batch_size`` window of ``graphs``.

    One extra pad graph / pad node is always reserved so padding has a home.
    """
    max_nodes = max(g.num_nodes for g in graphs)
    max_edges = max(g.num_edges for g in graphs)
    n_pad = _round_up(batch_size * max_nodes + 1, node_multiple)
    e_pad = _round_up(max(batch_size * max_edges, 1), edge_multiple)
    g_pad = batch_size + 1
    return n_pad, e_pad, g_pad


def batch_graphs(
    graphs: Sequence[Graph],
    n_pad: int,
    e_pad: int,
    g_pad: int,
    y_dtype=np.float32,
) -> GraphBatch:
    """Concatenate graphs block-diagonally and pad to (n_pad, e_pad, g_pad)."""
    n_graphs = len(graphs)
    assert n_graphs < g_pad, (n_graphs, g_pad)
    total_nodes = sum(g.num_nodes for g in graphs)
    total_edges = sum(g.num_edges for g in graphs)
    assert total_nodes < n_pad, (total_nodes, n_pad)  # strict: ≥1 pad node
    assert total_edges <= e_pad, (total_edges, e_pad)

    atoms = np.zeros(n_pad, dtype=np.int32)
    pos = np.zeros((n_pad, 3), dtype=np.float32)
    senders = np.full(e_pad, n_pad - 1, dtype=np.int32)
    receivers = np.full(e_pad, n_pad - 1, dtype=np.int32)
    graph_id = np.full(n_pad, g_pad - 1, dtype=np.int32)
    node_mask = np.zeros(n_pad, dtype=bool)
    edge_mask = np.zeros(e_pad, dtype=bool)
    graph_mask = np.zeros(g_pad, dtype=bool)
    first_node = np.full(g_pad, n_pad - 1, dtype=np.int32)

    ys = [np.atleast_1d(np.asarray(g.y)) for g in graphs]
    y_dim = ys[0].shape[0] if ys else 1
    y = np.zeros((g_pad, y_dim), dtype=y_dtype)

    n_off = 0
    e_off = 0
    for i, g in enumerate(graphs):
        nn, ne = g.num_nodes, g.num_edges
        atoms[n_off : n_off + nn] = g.atoms
        pos[n_off : n_off + nn] = g.pos
        senders[e_off : e_off + ne] = g.edge_index[0] + n_off
        receivers[e_off : e_off + ne] = g.edge_index[1] + n_off
        graph_id[n_off : n_off + nn] = i
        node_mask[n_off : n_off + nn] = True
        edge_mask[e_off : e_off + ne] = True
        graph_mask[i] = True
        first_node[i] = n_off
        y[i] = ys[i].astype(y_dtype)
        n_off += nn
        e_off += ne

    return GraphBatch(
        atoms=jnp.asarray(atoms),
        pos=jnp.asarray(pos),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        graph_id=jnp.asarray(graph_id),
        y=jnp.asarray(y),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(graph_mask),
        first_node=jnp.asarray(first_node),
    )


@struct.dataclass
class SlotData:
    """Device-resident dataset in per-graph slot-padded layout.

    Every graph is padded to ``Sn`` nodes / ``Se`` edges (edge indices LOCAL
    to the graph).  Row M (the last) is a blank sentinel graph used to pad
    partial batches.  Batches are assembled ON DEVICE (``assemble_batch``)
    from a vector of graph indices, so the whole training set is transferred
    to HBM exactly once and per-epoch shuffling is a device-side
    ``jax.random.permutation`` — no host staging, no per-run transfer.
    This replaces PyG's host DataLoader shuffle (reference
    experiments/graph_angle_prediction.py:122-124) with a TPU-resident
    equivalent."""

    atoms: jnp.ndarray        # [M+1, Sn] int32
    pos: jnp.ndarray          # [M+1, Sn, 3] f32
    senders: jnp.ndarray      # [M+1, Se] int32, local indices
    receivers: jnp.ndarray    # [M+1, Se] int32
    node_mask: jnp.ndarray    # [M+1, Sn] bool
    edge_mask: jnp.ndarray    # [M+1, Se] bool
    y: jnp.ndarray            # [M+1, y_dim]
    # optional slotted triplet/quad structure (directional models); local
    # node/edge/triplet indices, padded to St/Sq per graph
    tri_i: Optional[jnp.ndarray] = None      # [M+1, St]
    tri_j: Optional[jnp.ndarray] = None
    tri_k: Optional[jnp.ndarray] = None
    tri_kj: Optional[jnp.ndarray] = None     # edge ids
    tri_ji: Optional[jnp.ndarray] = None
    tri_mask: Optional[jnp.ndarray] = None
    q_trip: Optional[jnp.ndarray] = None     # [M+1, Sq] triplet ids
    q_kn: Optional[jnp.ndarray] = None       # [M+1, Sq] node ids
    q_mask: Optional[jnp.ndarray] = None

    @property
    def num_graphs(self) -> int:      # real graphs (sentinel excluded)
        return self.atoms.shape[0] - 1

    @property
    def slot_nodes(self) -> int:
        return self.atoms.shape[1]

    @property
    def slot_edges(self) -> int:
        return self.senders.shape[1]


def build_slot_data(graphs: Sequence[Graph], y_dtype=np.float32,
                    sn: Optional[int] = None,
                    se: Optional[int] = None,
                    with_triplets: bool = False,
                    with_quads: bool = False) -> SlotData:
    """Host-side one-time packing of graphs into slot layout."""
    m = len(graphs)
    sn = sn or max(g.num_nodes for g in graphs)
    se = se or max(max(g.num_edges for g in graphs), 1)
    atoms = np.zeros((m + 1, sn), np.int32)
    pos = np.zeros((m + 1, sn, 3), np.float32)
    senders = np.full((m + 1, se), sn - 1, np.int32)
    receivers = np.full((m + 1, se), sn - 1, np.int32)
    node_mask = np.zeros((m + 1, sn), bool)
    edge_mask = np.zeros((m + 1, se), bool)
    ys = [np.atleast_1d(np.asarray(g.y)) for g in graphs]
    y_dim = ys[0].shape[0] if ys else 1
    y = np.zeros((m + 1, y_dim), y_dtype)
    for i, g in enumerate(graphs):
        nn, ne = g.num_nodes, g.num_edges
        assert nn <= sn and ne <= se, (nn, sn, ne, se)
        atoms[i, :nn] = g.atoms
        pos[i, :nn] = g.pos
        senders[i, :ne] = g.edge_index[0]
        receivers[i, :ne] = g.edge_index[1]
        node_mask[i, :nn] = True
        edge_mask[i, :ne] = True
        y[i] = ys[i].astype(y_dtype)

    tri_kw = {}
    if with_triplets or with_quads:
        from .triplets import graph_triplets

        tris = [graph_triplets(g, with_quads) for g in graphs]
        st = max(max((len(t[0]) for t in tris), default=1), 1)
        names = ("tri_i", "tri_j", "tri_k", "tri_kj", "tri_ji")
        fills = (sn - 1, sn - 1, sn - 1, se - 1, se - 1)
        arrs = {k: np.full((m + 1, st), f, np.int32)
                for k, f in zip(names, fills)}
        tmask = np.zeros((m + 1, st), bool)
        for i, t in enumerate(tris):
            nt = len(t[0])
            for k, a in zip(names, t[:5]):
                arrs[k][i, :nt] = a
            tmask[i, :nt] = True
        tri_kw = {k: jnp.asarray(v) for k, v in arrs.items()}
        tri_kw["tri_mask"] = jnp.asarray(tmask)
        if with_quads:
            sq = max(max((len(t[5]) for t in tris), default=1), 1)
            q_trip = np.full((m + 1, sq), st - 1, np.int32)
            q_kn = np.full((m + 1, sq), sn - 1, np.int32)
            qmask = np.zeros((m + 1, sq), bool)
            for i, t in enumerate(tris):
                nq = len(t[5])
                q_trip[i, :nq] = t[5]
                q_kn[i, :nq] = t[6]
                qmask[i, :nq] = True
            tri_kw.update(q_trip=jnp.asarray(q_trip), q_kn=jnp.asarray(q_kn),
                          q_mask=jnp.asarray(qmask))

    return SlotData(
        atoms=jnp.asarray(atoms), pos=jnp.asarray(pos),
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_mask=jnp.asarray(node_mask), edge_mask=jnp.asarray(edge_mask),
        y=jnp.asarray(y), **tri_kw,
    )


def assemble_batch(slot: SlotData, idx) -> GraphBatch:
    """Device-side batch assembly from graph indices ``idx`` [B] (index == M
    selects the blank sentinel).  Produces the same GraphBatch contract as
    ``batch_graphs`` except nodes live at fixed per-graph offsets (graph i's
    nodes at [i*Sn, i*Sn+Sn)); pad nodes are masked and pooled into the
    trailing pad graph; pad edges are edge_mask=False (every op in the
    framework masks by edge_mask, so their endpoints are irrelevant)."""
    b = idx.shape[0]
    m = slot.num_graphs
    sn, se = slot.slot_nodes, slot.slot_edges
    idx = jnp.minimum(idx.astype(jnp.int32), m)
    atoms = slot.atoms[idx].reshape(-1)
    pos = slot.pos[idx].reshape(-1, 3)
    node_mask = slot.node_mask[idx].reshape(-1)
    edge_mask = slot.edge_mask[idx].reshape(-1)
    off = jnp.arange(b, dtype=jnp.int32) * sn
    senders = (slot.senders[idx] + off[:, None]).reshape(-1)
    receivers = (slot.receivers[idx] + off[:, None]).reshape(-1)
    gid = jnp.repeat(jnp.arange(b, dtype=jnp.int32), sn)
    graph_id = jnp.where(node_mask, gid, b)          # pad nodes -> pad graph
    graph_mask = jnp.concatenate([idx < m, jnp.zeros((1,), bool)])
    y = jnp.concatenate([slot.y[idx],
                         jnp.zeros((1,) + slot.y.shape[1:], slot.y.dtype)])
    first_node = jnp.concatenate(
        [off, jnp.asarray([b * sn - 1], jnp.int32)]
    )
    triplets = None
    if slot.tri_i is not None:
        eoff = (jnp.arange(b, dtype=jnp.int32) * se)[:, None]
        noff = off[:, None]
        tmask = slot.tri_mask[idx].reshape(-1)
        tri = dict(
            idx_i=(slot.tri_i[idx] + noff).reshape(-1),
            idx_j=(slot.tri_j[idx] + noff).reshape(-1),
            idx_k=(slot.tri_k[idx] + noff).reshape(-1),
            idx_kj=(slot.tri_kj[idx] + eoff).reshape(-1),
            idx_ji=(slot.tri_ji[idx] + eoff).reshape(-1),
            t_mask=tmask,
        )
        if slot.q_trip is not None:
            st = slot.tri_i.shape[1]
            toff = (jnp.arange(b, dtype=jnp.int32) * st)[:, None]
            tri["q_trip"] = (slot.q_trip[idx] + toff).reshape(-1)
            tri["q_kn"] = (slot.q_kn[idx] + noff).reshape(-1)
            tri["q_mask"] = slot.q_mask[idx].reshape(-1)
        triplets = TripletData(**tri)
    return GraphBatch(
        atoms=atoms, pos=pos, senders=senders, receivers=receivers,
        graph_id=graph_id, y=y, node_mask=node_mask, edge_mask=edge_mask,
        graph_mask=graph_mask, first_node=first_node, triplets=triplets,
    )


def eval_slot_indices(num_graphs: int, batch_size: int) -> np.ndarray:
    """Static [steps, B] index plan for an unshuffled (eval) pass; sentinel
    index M pads the last partial batch."""
    steps = (num_graphs + batch_size - 1) // batch_size
    idx = np.full(steps * batch_size, num_graphs, np.int32)
    idx[:num_graphs] = np.arange(num_graphs)
    return idx.reshape(steps, batch_size)


class GraphLoader:
    """Host-side batching iterator over a list of ``Graph``s with static
    padded shapes — the TPU replacement for PyG DataLoader
    (graph_angle_prediction.py:122-124). All batches share one bucket so a
    single jit compilation covers the epoch.

    The last incomplete batch is kept (like the reference's DataLoader).
    """

    def __init__(
        self,
        graphs: Sequence[Graph],
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        y_dtype=np.float32,
        pad: Optional[tuple] = None,
        with_triplets: bool = False,
        with_quads: bool = False,
        triplet_pad: Optional[tuple] = None,
    ):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.y_dtype = y_dtype
        self.pad = pad or pad_sizes(self.graphs, batch_size)
        self.with_triplets = with_triplets or with_quads
        self.with_quads = with_quads
        if self.with_triplets:
            from .triplets import triplet_pad_sizes

            self.triplet_pad = triplet_pad or triplet_pad_sizes(
                self.graphs, batch_size, with_quads
            )
        else:
            self.triplet_pad = None

    def __len__(self):
        return (len(self.graphs) + self.batch_size - 1) // self.batch_size

    @property
    def num_examples(self):
        return len(self.graphs)

    def __iter__(self):
        order = np.arange(len(self.graphs))
        if self.shuffle:
            self.rng.shuffle(order)
        n_pad, e_pad, g_pad = self.pad
        for i in range(0, len(order), self.batch_size):
            chunk = [self.graphs[j] for j in order[i : i + self.batch_size]]
            batch = batch_graphs(chunk, n_pad, e_pad, g_pad, self.y_dtype)
            if self.with_triplets:
                from .triplets import batch_triplets

                t_pad, q_pad = self.triplet_pad
                batch = batch.replace(
                    triplets=batch_triplets(
                        chunk, n_pad, e_pad, t_pad, q_pad, self.with_quads
                    )
                )
            yield batch

    def stacked_epochs(self, n_epochs: int, base_seed: int = 0) -> List[GraphBatch]:
        """Materialize shuffled epochs (for scan-over-epochs training)."""
        out = []
        for ep in range(n_epochs):
            out.extend(self)
        return out

    def stage_epochs(self, n_epochs: int) -> Optional[GraphBatch]:
        """Fast path: build every batch of ``n_epochs`` shuffled epochs with
        the native C++ batcher in one shot; returns a GraphBatch with leading
        dims [n_epochs, steps] or None when unavailable (triplets needed or
        no toolchain)."""
        if self.with_triplets:
            return None
        try:
            from .native import fast_build_batches
            from .native.batch import FlatDataset
        except Exception:
            return None
        if not hasattr(self, "_flat"):
            self._flat = FlatDataset(self.graphs)
        n_pad, e_pad, g_pad = self.pad
        steps = len(self)
        chunks = []
        for _ in range(n_epochs):
            order = np.arange(len(self.graphs))
            if self.shuffle:
                self.rng.shuffle(order)
            out = fast_build_batches(self._flat, order, self.batch_size,
                                     n_pad, e_pad, g_pad)
            if out is None:
                return None
            chunks.append(out)
        stacked = {
            k: np.stack([c[k] for c in chunks]).reshape(
                (n_epochs, steps) + chunks[0][k].shape[1:]
            )
            for k in chunks[0]
        }
        for k in ("node_mask", "edge_mask", "graph_mask"):
            stacked[k] = stacked[k].astype(bool)
        return GraphBatch(
            triplets=None,
            **{k: jnp.asarray(v) for k, v in stacked.items()},
        )


def random_split(dataset: Sequence, fractions: Sequence[float], seed: int = 0):
    """Deterministic random split; mirrors the 50/20/30 protocol at
    graph_angle_prediction.py:108-119 (numpy RNG, not torch's — splits are
    statistically equivalent, not bit-identical)."""
    n = len(dataset)
    sizes = [int(f * n) for f in fractions[:-1]]
    sizes.append(n - sum(sizes))
    perm = np.random.default_rng(seed).permutation(n)
    out, off = [], 0
    for s in sizes:
        out.append([dataset[int(i)] for i in perm[off : off + s]])
        off += s
    return out


def sort_edges_by_receiver(g: Graph) -> Graph:
    """Reorder a graph's edge list by receiver (edge_index[1]) — the layout
    the sorted-segment Pallas kernel (ops/pallas_sorted_segsum.py) exploits:
    the receiver-side tile plan becomes an identity permutation.  Pure
    reordering: every edge-permutation-invariant consumer (all models) is
    unaffected up to f32 reduction order."""
    ei = np.asarray(g.edge_index)
    order = np.argsort(ei[1], kind="stable")
    return Graph(g.atoms, ei[:, order], g.pos, g.y)
