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


def make_mesh_for_batch(*batch_sizes: int, limit: int = 0) -> Mesh:
    """Mesh over the largest device count that divides every batch size.

    Keeps batch sharding exact (no padding) when batches don't tile the
    full device count — e.g. unit tests with tiny batches on a virtual
    8-device mesh. `limit` > 0 caps the mesh size
    (config.num_data_shards; 0 = use every divisible device).
    """
    n_avail = len(jax.devices())
    if jax.process_count() > 1:
        # multi-process: a sub-mesh of jax.devices()[:n] would exclude
        # whole processes (their make_array_from_process_local_data rows
        # would map nowhere). The global mesh must span every device, so
        # the (global) batch must divide it — fail loudly, don't shrink.
        bad = [b for b in batch_sizes if b % n_avail]
        if bad:
            raise ValueError(
                f"multi-process mesh: global batch size(s) {bad} must "
                f"divide the {n_avail} global devices.")
        if limit and 0 < limit < n_avail:
            raise ValueError(
                "num_data_shards cannot shrink a multi-process mesh "
                f"({limit} < {n_avail} devices spanning "
                f"{jax.process_count()} processes).")
        return make_mesh(None)
    n = n_avail
    if limit and limit > 0:
        n = min(n, int(limit))
    capped = n
    while n > 1 and any(b % n for b in batch_sizes):
        n -= 1
    if n < capped:
        # Loud guardrail: on a real slice every dropped device is idle
        # silicon (SCST's reference batch 10 on 8 devices -> 5 used, 37%
        # idle). Fix by padding the batch or picking a divisible one.
        idle = capped - n
        hints = sorted({max(round(b / capped), 1) * capped
                        for b in batch_sizes})
        print(
            f"WARNING: batch size(s) {sorted(set(batch_sizes))} are not "
            f"divisible by {capped} devices; using a {n}-device mesh "
            f"({idle} device{'s' if idle != 1 else ''} IDLE). Choose a "
            f"batch divisible by {capped} (nearby: {hints}) to use the "
            "full slice.")
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


def start_host_fetch(*arrays) -> None:
    """Kick off async device->host copies so a later np.asarray finds the
    bytes already on host instead of paying a synchronous link round trip
    (~40 ms on the tunneled dev backend — CLAUDE.md). No-op for values
    without copy_to_host_async (plain numpy)."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass


def local_batch(x, axis: int = 0) -> np.ndarray:
    """Host-addressable rows of a batch-sharded global array, concatenated
    in shard order along `axis` (SURVEY §7 step 8: each host scores ITS
    shard of the SCST rollout; single-host this is just the whole array).
    `axis` matters for beam-major layouts like (beam, batch, time).

    Raises instead of returning duplicated/short rows when the array is
    not disjointly batch-sharded along `axis` (e.g. GSPMD replicated an
    output because the producing jit did not pin `out_shardings`)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    by_start = {}
    for s in x.addressable_shards:
        start = s.index[axis].start
        by_start.setdefault(0 if start is None else int(start), s)
    starts = sorted(by_start)
    parts = [np.asarray(by_start[k].data) for k in starts]
    pos = starts[0]
    for st, p in zip(starts, parts):  # contiguity of this host's block
        if st != pos:
            raise ValueError(
                f"local_batch: non-contiguous shards along axis {axis} "
                f"(expected start {pos}, got {st}); pin out_shardings="
                "batch_sharding(mesh) on the producing jit.")
        pos += p.shape[axis]
    out = np.concatenate(parts, axis=axis)
    expect = x.shape[axis] // jax.process_count()
    if out.shape[axis] != expect:
        raise ValueError(
            f"local_batch: host holds {out.shape[axis]} of "
            f"{x.shape[axis]} rows along axis {axis}, expected a disjoint "
            f"1/{jax.process_count()} block of {expect}; the array is "
            "probably replicated — pin out_shardings=batch_sharding(mesh) "
            "on the producing jit.")
    return out


def local_batch_start(x, axis: int = 0) -> int:
    """Global index of this host's first addressable row along `axis`."""
    starts = [s.index[axis].start or 0 for s in x.addressable_shards]
    return int(min(starts)) if starts else 0


def global_batch(mesh: Mesh, x_local: np.ndarray, axis: int = 0):
    """Inverse of local_batch: assemble a batch-sharded global array from
    each host's local rows along `axis` (identity on single host).

    Multi-process jit REJECTS per-host numpy against a non-trivially
    sharded global mesh ('Passing non-trivial shardings for numpy inputs
    is not allowed') — every batch fed to a sharded train/eval/rollout
    step must pass through here (or feed_global) first."""
    if jax.process_count() == 1:
        return x_local
    x_local = np.asarray(x_local)
    spec = [None] * x_local.ndim
    spec[axis] = DATA_AXIS
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(*spec)), x_local)


def feed_global(mesh: Mesh, x, axis: int = 0):
    """Full per-host batch (IDENTICAL content on every host, e.g. an
    unsharded eval/SCST pipeline) -> batch-sharded global array of the
    same global size: each process contributes its contiguous block.
    Identity on single host."""
    n = jax.process_count()
    if n == 1:
        return x
    x = np.asarray(x)
    size = x.shape[axis]
    if size % n:
        raise ValueError(
            f"feed_global: batch axis {axis} of size {size} does not "
            f"divide across {n} processes.")
    blk = size // n
    sl = [slice(None)] * x.ndim
    pid = jax.process_index()
    sl[axis] = slice(pid * blk, (pid + 1) * blk)
    return global_batch(mesh, x[tuple(sl)], axis=axis)
