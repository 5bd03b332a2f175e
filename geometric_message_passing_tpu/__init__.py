"""geometric_message_passing_tpu — a TPU-native geometric message-passing
framework (JAX / XLA / Pallas / pjit).

Built from scratch with the capabilities of NW-JEFF/Geometric-Message-Passing
(the geometric-gnn-dojo fork): the 7-model geometric GNN zoo (SchNet,
DimeNet++, SphereNet, EGNN, GVP-GNN, TFN, MACE), the synthetic expressivity
benchmarks (k-chains, rotsym, incompleteness, angle regression), and the
experiment harness — redesigned TPU-first:

  * static-shape padded graph batches (graph.py) instead of dynamic PyG
    batching;
  * build-time constant algebra (irreps.py) instead of e3nn runtime codegen;
  * masked segment reductions + fused edge kernels (ops/) instead of
    torch_scatter/torch_sparse CUDA;
  * one jit-compiled lax.scan program per experiment (experiments/train.py)
    instead of an eager per-batch loop;
  * mesh/collective layer with DP sharding + edge-partitioned halo exchange
    (parallel/), which the reference does not have at all.
"""

__version__ = "0.1.0"

import os as _os

from . import datasets, graph, irreps, ops  # noqa

# on-disk cache for expensive build-time tensors (MACE U matrices):
# default to a repo-local directory, overridable via GMP_CACHE_DIR.
irreps.set_disk_cache(
    _os.environ.get(
        "GMP_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".gmp_cache"),
    )
)
from .graph import Graph, GraphBatch, GraphLoader, random_split  # noqa
from .irreps import Irrep, Irreps  # noqa
