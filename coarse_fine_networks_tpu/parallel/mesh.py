"""Device mesh and sharding helpers."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices.

    Multi-host runs use the same code path — ``jax.devices()`` spans all
    hosts and XLA routes collectives over ICI within a slice / DCN across
    slices.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, leading_accum: bool = False) -> Any:
    """Build the globally batch-sharded arrays for one step.

    Single-process: ``batch`` is the full global batch; ``device_put`` splits
    it over the local devices.  Multi-process (``jax.process_count() > 1``):
    ``batch`` is this host's *local shard* (``global_batch /
    process_count`` rows, in process order — see
    :class:`..data.loader.PrefetchLoader` ``shard=``), and the global array is
    assembled with ``jax.make_array_from_process_local_data`` — no host ever
    materialises the full batch.

    ``leading_accum=True`` shards axis 1 instead — for gradient-accumulation
    batches stacked with a leading micro-step axis.
    """
    spec = P(None, DATA_AXIS) if leading_accum else P(DATA_AXIS)
    sh = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sh, np.asarray(a)), batch)

    def put(a):
        # arrays a producer already committed to the target sharding (e.g.
        # device_normalize_s2d(mesh=...) — layout-pinned) pass through
        # untouched; device_put would reset their custom layout
        if getattr(a, "sharding", None) == sh:
            return a
        return jax.device_put(a, sh)

    return jax.tree.map(put, batch)


def host_local_rows(arr: Any, axis: int = 0) -> np.ndarray:
    """This host's rows of a batch-sharded global array, as numpy.

    Single-process: the whole array.  Multi-process: the contiguous slice of
    ``axis`` this process contributed (host-side metrics like the AP meter
    consume per-host rows paired with the host-local labels).
    """
    if jax.process_count() == 1:
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[axis].start or 0)
    seen = []
    parts = []
    for s in shards:
        start = s.index[axis].start or 0
        if start in seen:
            continue  # replicated over other mesh axes
        seen.append(start)
        parts.append(np.asarray(s.data))
    return np.concatenate(parts, axis=axis)


def process_shard(rank: Optional[int] = None,
                  world: Optional[int] = None) -> tuple[int, int]:
    """(rank, world) of this process for dataset/batch sharding — identity
    ``(0, 1)`` in single-process runs."""
    if rank is None:
        rank = jax.process_index()
    if world is None:
        world = jax.process_count()
    return rank, world


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicate_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
