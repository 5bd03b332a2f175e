"""Device mesh + collective wrappers — the communication layer the reference
lacks entirely (SURVEY §2.5: no torch.distributed anywhere; single device at
graph_angle_prediction.py:29).

Design: `jax.sharding.Mesh` over ICI (intra-slice) with named axes
  dp — data parallel over graph shards
  gp — graph/edge parallel (halo exchange of boundary node features)
XLA inserts the collectives; these wrappers pin the axis names so models and
the trainer never touch raw lax primitives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("dp",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices. Default: 1-D dp mesh over all
    devices."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


class collectives:
    """Named-axis collective wrappers (the NCCL-equivalent surface)."""

    @staticmethod
    def all_reduce_sum(x, axis: str = "dp"):
        return jax.lax.psum(x, axis_name=axis)

    @staticmethod
    def all_reduce_mean(x, axis: str = "dp"):
        return jax.lax.pmean(x, axis_name=axis)

    @staticmethod
    def all_gather(x, axis: str = "dp", tiled: bool = False):
        return jax.lax.all_gather(x, axis_name=axis, tiled=tiled)

    @staticmethod
    def all_to_all(x, axis: str = "dp", split_axis: int = 0, concat_axis: int = 0):
        return jax.lax.all_to_all(x, axis_name=axis, split_axis=split_axis,
                                  concat_axis=concat_axis)

    @staticmethod
    def ppermute(x, perm, axis: str = "dp"):
        return jax.lax.ppermute(x, axis_name=axis, perm=perm)

    @staticmethod
    def axis_index(axis: str = "dp"):
        return jax.lax.axis_index(axis)

    @staticmethod
    def fold_in_axes(rng, *axes: str):
        """Derive a per-device PRNG key by folding each mesh axis position
        into ``rng`` — so e.g. dropout masks differ across shards instead of
        repeating one mask mesh-wide."""
        for ax in axes:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
        return rng


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_leading(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


# ---------------------------------------------------------------------------
# Multi-host (multi-slice) runtime
# ---------------------------------------------------------------------------


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize the multi-host JAX runtime (`jax.distributed.initialize`).

    Call ONCE per host process before any jax computation on a multi-host
    pod slice (or multi-slice DCN deployment).  On cloud TPU all arguments
    are auto-detected from the environment; pass them explicitly elsewhere.
    Returns this process's index.  Single-process runs may skip this —
    every other API in this module works unchanged on one host.
    """
    if jax.process_count() == 1 and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            # not in a multi-host environment — single-process mode
            return 0
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index()


def make_hybrid_mesh(ici_shape: Tuple[int, ...],
                     dcn_shape: Tuple[int, ...],
                     axis_names: Sequence[str]) -> Mesh:
    """Mesh spanning slices, axis i sized ici_shape[i] * dcn_shape[i]
    (shapes must have equal rank; `mesh_utils.create_hybrid_device_mesh`).
    Put pure-data parallelism on the DCN-extended axis (one gradient psum
    per step tolerates slow links) and the communication-heavy strategies
    (gp halo exchange, tp channel sharding) on ICI-only axes — the standard
    bandwidth-hierarchy-aware layout.

    Example — 2 slices x 8 chips, DP across slices, gp within each slice:
        make_hybrid_mesh(ici_shape=(1, 8), dcn_shape=(2, 1), ("dp", "gp"))

    On a single-granule platform (one process, no slice topology — e.g.
    the 8-virtual-device CPU test mesh) the same two-tier LAYOUT is
    emulated: the flat device list is partitioned into ``prod(dcn_shape)``
    contiguous pseudo-slices of ``prod(ici_shape)`` devices, arranged
    dcn-major per axis exactly as the real hybrid mesh would be — so
    programs written against the hybrid axis layout execute (and are
    tested) without pod hardware, and run unchanged on one.
    """
    from jax.experimental import mesh_utils

    if len(ici_shape) != len(dcn_shape):
        raise ValueError(f"rank mismatch: {ici_shape} vs {dcn_shape}")
    try:
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=tuple(ici_shape),
            dcn_mesh_shape=tuple(dcn_shape),
            devices=jax.devices(),
        )
    except (ValueError, AssertionError):
        import numpy as _np

        devices = jax.devices()
        need = 1
        for i, d in zip(ici_shape, dcn_shape):
            need *= i * d
        if len(devices) < need:
            raise ValueError(
                f"hybrid mesh {ici_shape}x{dcn_shape} needs {need} devices, "
                f"have {len(devices)}")
        # (d0, d1, ..., i0, i1, ...) then interleave to (d0, i0, d1, i1, ..)
        # and merge adjacent pairs -> axis k has size dcn[k]*ici[k] with the
        # dcn granule major (same convention as create_hybrid_device_mesh).
        arr = _np.asarray(devices[:need]).reshape(
            tuple(dcn_shape) + tuple(ici_shape))
        rank = len(ici_shape)
        perm = []
        for k in range(rank):
            perm += [k, rank + k]
        arr = arr.transpose(perm).reshape(
            tuple(d * i for d, i in zip(dcn_shape, ici_shape)))
    return Mesh(arr, axis_names)


def make_multihost_mesh(axis_names: Sequence[str] = ("dp",),
                        ici_shape: Optional[Tuple[int, ...]] = None,
                        dcn_shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """One-call multi-host mesh: ``init_distributed()`` + the bandwidth-
    hierarchy-aware default layout — the LEADING axis (conventionally
    ``dp``) spans processes over DCN, every other axis lives inside a
    slice on ICI.  On a single process this degrades to a plain local
    mesh with axis 0 sized 1 (the same program then runs unchanged on a
    pod slice).  Pass explicit shapes to override the defaults.

    Convention for data: shard the batch over the leading axis and feed
    each process its own rows (``process_local_slice`` +
    ``global_batch_from_local``); gradient psums over ``dp`` are the only
    DCN traffic, which is the layout the scaling literature prescribes
    for data parallelism across slow links.
    """
    init_distributed()
    nproc = jax.process_count()
    nlocal = jax.local_device_count()
    n_axes = len(axis_names)
    if ici_shape is None:
        # all local devices on the LAST axis, middle axes singleton
        ici_shape = (1,) * (n_axes - 1) + (nlocal,) if n_axes > 1 \
            else (nlocal,)
    if dcn_shape is None:
        dcn_shape = (nproc,) + (1,) * (n_axes - 1)
    if nproc == 1:
        # hybrid mesh construction requires >1 granule per DCN axis; the
        # single-process equivalent is a plain local mesh of the same shape
        shape = tuple(i * d for i, d in zip(ici_shape, dcn_shape))
        return make_mesh(shape, axis_names)
    return make_hybrid_mesh(ici_shape, dcn_shape, axis_names)


def process_local_slice(n: int, process_index: Optional[int] = None,
                        process_count: Optional[int] = None) -> slice:
    """This process's contiguous row range of a length-``n`` global batch
    axis (the multi-host batch-sharding convention: contiguous per-process
    blocks, process order = process_index order, matching the device order
    of ``make_multihost_mesh``'s leading axis).  ``n`` must divide evenly —
    pad the global batch to a multiple of ``process_count`` upstream (the
    same padding discipline every static-shape batch here already uses)."""
    p = jax.process_index() if process_index is None else process_index
    np_ = jax.process_count() if process_count is None else process_count
    if n % np_:
        raise ValueError(
            f"global batch length {n} must be divisible by process_count "
            f"{np_}; pad the batch (mask rows) to a multiple first")
    per = n // np_
    return slice(p * per, (p + 1) * per)


def global_batch_from_local(mesh: Mesh, local_batch, axis: str = "dp"):
    """Assemble the globally-sharded on-device batch from THIS process's
    local (numpy) shard — each process passes only its ``process_local_
    slice`` rows and JAX stitches the global logical array without any
    cross-host data movement (`jax.make_array_from_process_local_data`).

    Works identically on one process (local == global), so tests exercise
    the exact code path that runs on a pod."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        local_batch,
    )
