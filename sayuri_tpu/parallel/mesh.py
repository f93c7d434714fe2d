"""Device mesh and sharding helpers.

The reference parallelizes with one CUDA graph + worker thread per GPU
(cuda_forward_pipe.cc:14-33) and torch DataParallel for training
(train.py:316). On TPU both collapse into one concept: a
`jax.sharding.Mesh` over the slice with batch-dim sharding; XLA inserts the
all-reduces over ICI. Multi-host extends the same mesh over DCN
transparently via jax.distributed.

Axes convention (scaling-book style):
- "data": batch-parallel axis for training and self-play env batches.
  Convnets on 19x19 boards need no tensor/sequence sharding (SURVEY.md
  §2.10 P9): all model axes stay replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a host batch with its leading dim sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
