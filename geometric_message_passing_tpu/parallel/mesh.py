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


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_leading(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
