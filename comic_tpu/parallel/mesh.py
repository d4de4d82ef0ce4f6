"""Device mesh and sharding helpers: data parallelism over ICI.

The reference is strictly single-device (SURVEY.md §2.9). The TPU-native
scaling story for this model family (4-13M decoder + 6M CNN params, far
below one chip's HBM) is pure batch data-parallelism: a 1-D mesh over all
chips, batch-sharded inputs, replicated parameters, and XLA-inserted
gradient all-reduces riding ICI. Multi-host runs shard the input pipeline
per host (`process_index`-strided file lists).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_for_batch(*batch_sizes: int) -> Mesh:
    """Mesh over the largest device count that divides every batch size.

    Keeps batch sharding exact (no padding) when batches don't tile the
    full device count — e.g. unit tests with tiny batches on a virtual
    8-device mesh.
    """
    n = len(jax.devices())
    while n > 1 and any(b % n for b in batch_sizes):
        n -= 1
    return make_mesh(n)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded across the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Put host arrays on the mesh with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def host_shard_indices(n_items: int, batch_size: int) -> range:
    """Per-host strided sharding of a file list for multi-host input
    pipelines (each host feeds its local devices)."""
    pid, n = jax.process_index(), jax.process_count()
    return range(pid, n_items, n)


def local_batch(x, axis: int = 0) -> np.ndarray:
    """Host-addressable rows of a batch-sharded global array, concatenated
    in shard order along `axis` (SURVEY §7 step 8: each host scores ITS
    shard of the SCST rollout; single-host this is just the whole array).
    `axis` matters for beam-major layouts like (beam, batch, time)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[axis].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=axis)


def global_batch(mesh: Mesh, x_local: np.ndarray):
    """Inverse of local_batch: assemble a batch-sharded global array from
    each host's local rows (identity wrapper on single host)."""
    if jax.process_count() == 1:
        return x_local
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh), x_local)
