"""Mesh/sharding utilities: the TPU-native replacement for the reference's
multi-GPU worker threads and torch DataParallel (SURVEY.md §2.10)."""

from sayuri_tpu.parallel.mesh import make_mesh, shard_batch, replicate
