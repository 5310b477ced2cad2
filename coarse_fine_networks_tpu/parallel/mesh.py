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
    """device_put every array in the batch pytree, batch-dim sharded.

    ``leading_accum=True`` shards axis 1 instead — for gradient-accumulation
    batches stacked with a leading micro-step axis.
    """
    spec = P(None, DATA_AXIS) if leading_accum else P(DATA_AXIS)
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicate_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
