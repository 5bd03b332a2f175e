"""Compiled batch-inference engine (serving path).

The reference has no inference story beyond calling ``model(batch)`` in an
eval loop (train_utils.py:37-49); under jit every new batch SHAPE would
recompile.  ``Predictor`` pins one padded bucket (nodes/edges/graphs — and
triplets/quads for the directional models) so every call after the first
reuses ONE compiled program: per-call cost is one host->device transfer and
one device execution, independent of dataset size or graph-size jitter.

    pred = Predictor(model, variables, batch_size=100)
    y = pred.predict(graphs)          # [len(graphs), out_dim] np.ndarray

The bucket is sized from the first ``predict`` call (or pass ``pad=`` /
``triplet_pad=`` explicitly, e.g. the training loader's).  Larger graphs
later auto-grow the bucket (one recompile, counted in ``trace_count``).

Pass ``mesh=`` (a ``jax.sharding.Mesh``) to serve over multiple chips:
batches are grouped per device and the whole group runs as one
``shard_map`` execution — data-parallel batch inference with zero
cross-chip communication (each chip's graphs pool chip-locally).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from ..graph import GraphLoader, pad_sizes


class Predictor:
    """Fixed-bucket compiled inference over a model's ``apply``."""

    def __init__(self, model, variables, batch_size: int = 100,
                 pad: Optional[tuple] = None,
                 triplet_pad: Optional[tuple] = None,
                 needs_triplets: bool = False, with_quads: bool = False,
                 y_dtype=np.float32, mesh=None, mesh_axis: str = "dp"):
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        self.pad = pad
        self.triplet_pad = triplet_pad
        self.needs_triplets = needs_triplets or with_quads
        self.with_quads = with_quads
        self.y_dtype = y_dtype
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.trace_count = 0          # number of XLA compilations paid

        def _apply(v, b):
            self.trace_count += 1     # runs only when jit traces
            return self.model.apply(v, b)

        if mesh is None:
            self._fn = jax.jit(_apply)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            def _local(v, stacked):
                b = jax.tree.map(lambda x: x[0], stacked)
                return _apply(v, b)[None]

            def _sharded(v, stacked):
                return shard_map(
                    _local, mesh=mesh,
                    in_specs=(P(), P(mesh_axis)), out_specs=P(mesh_axis),
                    check_vma=False,
                )(v, stacked)

            self._fn = jax.jit(_sharded)

    # -- bucket management ---------------------------------------------------

    def _grow_bucket(self, graphs: Sequence) -> None:
        need = pad_sizes(graphs, self.batch_size)
        if self.pad is None:
            self.pad = need
        elif any(n > p for n, p in zip(need, self.pad)):
            self.pad = tuple(max(n, p) for n, p in zip(need, self.pad))
        if self.needs_triplets:
            from ..triplets import triplet_pad_sizes

            need_t = triplet_pad_sizes(graphs, self.batch_size,
                                       self.with_quads)
            if self.triplet_pad is None:
                self.triplet_pad = need_t
            elif any(n > p for n, p in zip(need_t, self.triplet_pad)):
                self.triplet_pad = tuple(
                    max(n, p) for n, p in zip(need_t, self.triplet_pad))

    # -- inference -----------------------------------------------------------

    def predict(self, graphs: Sequence) -> np.ndarray:
        """Run the model over ``graphs``; returns [len(graphs), out_dim]."""
        if len(graphs) == 0:
            out_dim = getattr(self.model, "out_dim", None)
            if out_dim is None:
                raise ValueError(
                    "predict([]) needs the model to expose out_dim to shape "
                    "the empty result; call with at least one graph instead"
                )
            return np.zeros((0, out_dim), self.y_dtype)
        self._grow_bucket(graphs)
        loader = GraphLoader(
            graphs, self.batch_size, shuffle=False, y_dtype=self.y_dtype,
            pad=self.pad, with_triplets=self.needs_triplets,
            with_quads=self.with_quads, triplet_pad=self.triplet_pad,
        )
        if self.mesh is None:
            outs, remaining = [], len(graphs)
            for batch in loader:
                n_real = min(self.batch_size, remaining)
                remaining -= n_real
                out = self._fn(self.variables, batch)
                outs.append(np.asarray(out)[:n_real])
            return np.concatenate(outs, axis=0)

        # mesh path: group ndev batches per execution, pad the last group by
        # repeating its final batch (sliced away below)
        import jax.numpy as jnp

        ndev = self.mesh.shape[self.mesh_axis]
        batches = list(loader)
        reals = []
        remaining = len(graphs)
        for _ in batches:
            n_real = min(self.batch_size, remaining)
            remaining -= n_real
            reals.append(n_real)
        outs = []
        for g0 in range(0, len(batches), ndev):
            group = batches[g0 : g0 + ndev]
            n_live = len(group)
            group = group + [group[-1]] * (ndev - n_live)
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *group)
            out = np.asarray(self._fn(self.variables, stacked))
            for k in range(n_live):
                outs.append(out[k][: reals[g0 + k]])
        return np.concatenate(outs, axis=0)

    __call__ = predict
