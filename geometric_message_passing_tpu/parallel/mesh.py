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
    """
    from jax.experimental import mesh_utils

    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=tuple(ici_shape),
        dcn_mesh_shape=tuple(dcn_shape),
        devices=jax.devices(),
    )
    return Mesh(arr, axis_names)
