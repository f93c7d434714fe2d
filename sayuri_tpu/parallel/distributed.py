"""Multi-host scale-out scaffolding.

The reference scales self-play by launching N independent OS processes
that rendezvous on the filesystem: each selfplay worker polls weights_dir
for new weights (Engine::ShouldHalt, /root/reference/src/selfplay/
engine.cc:63-90) and the learner is a single-GPU torch process
(train/torch/parser.py). TPU-native re-design: ONE jax.distributed job
spanning all hosts. Every process holds a shard of a global "data" mesh;
self-play env+search batches and training batches are sharded over that
axis (each host computes its local lanes, XLA inserts ICI/DCN collectives
only where the program needs them — which for data-parallel selfplay is
nowhere, and for training is one gradient all-reduce). Weight refresh is a
host-0 device broadcast (`broadcast_from_host0`) instead of N filesystem
reads.

Topology conventions follow the scaling-book recipe: pick the mesh, shard
the batch dim, keep convnet params replicated (no tensor axis is large
enough on a 19x19 board to justify TP/PP — SURVEY.md §2.10 P9).

Environment contract (one process per host):
    SAYURI_COORDINATOR  host:port of process 0
    SAYURI_NUM_PROCS    total process count
    SAYURI_PROC_ID      this process's rank
`initialize_from_env()` is a no-op when these are unset, so single-host
code paths never pay for the scaffolding.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join the jax.distributed job. Returns True if multi-process.

    Safe to call multiple times; later calls are no-ops. With no arguments
    and no SAYURI_* env vars, stays single-process (returns False).
    """
    global _INITIALIZED
    coordinator = coordinator or os.environ.get("SAYURI_COORDINATOR")
    if coordinator is None:
        return False
    if _INITIALIZED:
        return True
    num_processes = num_processes or int(os.environ["SAYURI_NUM_PROCS"])
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ["SAYURI_PROC_ID"])
    )
    jax.distributed.initialize(coordinator, num_processes, process_id)
    _INITIALIZED = True
    return True


def initialize_from_env() -> bool:
    return initialize()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_mesh(axis: str = "data") -> Mesh:
    """Mesh over every device of every process (DCN-spanning)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_lane_slice(global_batch: int) -> slice:
    """The contiguous slice of global batch lanes this process owns under
    P("data") sharding of `global_mesh()` (devices are ordered by
    process)."""
    per = global_batch // jax.process_count()
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def make_global_batch(mesh: Mesh, tree, axis: str = "data"):
    """Assemble a globally-sharded batch from each process's LOCAL lanes.

    Every process passes its own local [b_local, ...] leaves; the result
    is a global array of [b_local * num_processes, ...] whose shards stay
    resident on their producing hosts (zero data motion)."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree.map(put, tree)


def broadcast_from_host0(tree):
    """Learner -> actor weight refresh as a device broadcast: process 0's
    values are shipped to every process over the ICI/DCN fabric (the
    TPU-native replacement for N processes re-reading weights_dir,
    engine.cc:63-90). Single-process: identity."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def local_batch(x, axis: int, global_b: int) -> np.ndarray:
    """local_lanes, then — if the leaf came back REPLICATED (eager ops on
    global arrays may pick replicated output shardings) — slice this
    host's deterministic lane range along `axis` (make_global_batch lays
    host lanes out contiguously in process order)."""
    y = local_lanes(x)
    if (
        jax.process_count() > 1
        and y.ndim > axis
        and y.shape[axis] == global_b
    ):
        local = global_b // jax.process_count()
        start = jax.process_index() * local
        sl = [slice(None)] * y.ndim
        sl[axis] = slice(start, start + local)
        y = y[tuple(sl)]
    return y


def local_lanes(x) -> np.ndarray:
    """This process's addressable slice of a batch-sharded global array,
    as one contiguous numpy block (each host serializes only the games it
    owns — the writer scales with hosts, like the reference's one
    data-dir-per-process layout). Works for any single partitioned dim
    ([B,...] states and [T,B,...] targets alike); replicated arrays
    return the full value. Single-process: the whole array."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    # dedupe replicated shards (same global index on several local devices)
    uniq = {}
    for s in x.addressable_shards:
        key = tuple((sl.start, sl.stop) for sl in s.index)
        uniq.setdefault(key, s)
    shards = list(uniq.values())
    if len(shards) == 1:
        return np.asarray(shards[0].data)
    dim = next(
        d
        for d in range(x.ndim)
        if len({s.index[d].start or 0 for s in shards}) > 1
    )
    shards.sort(key=lambda s: s.index[dim].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=dim)


def all_gather_to_host(tree):
    """Gather per-process shards so every host sees the full batch (used
    by the data writer, which serializes whole games to its local disk).
    Single-process: identity (values already addressable)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)
