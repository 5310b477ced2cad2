"""Parallelism: device mesh + sharding layout (replaces nn.DataParallel).

The reference's only parallelism is single-process ``nn.DataParallel``
(``train_fine.py:123``).  Here data parallelism is a ``jax.sharding.Mesh``
with the batch sharded over a ``data`` axis: gradients and batch-norm
statistics all-reduce over ICI via collectives XLA inserts automatically —
which also upgrades SubBatchNorm to *global* cross-replica statistics
(strictly better than per-GPU stats under DataParallel).
"""

from .mesh import (
    make_mesh,
    batch_sharding,
    process_shard,
    replicate_sharding,
    shard_batch,
)
from .tensor import (
    MODEL_AXIS,
    make_mesh2d,
    make_tp_tower,
    pad_tower_variables,
    shard_tower_variables,
    tower_param_specs,
    tp_param_bytes,
    tp_tower_apply,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "process_shard",
    "replicate_sharding",
    "shard_batch",
    "MODEL_AXIS",
    "make_mesh2d",
    "make_tp_tower",
    "pad_tower_variables",
    "shard_tower_variables",
    "tower_param_specs",
    "tp_param_bytes",
    "tp_tower_apply",
]
