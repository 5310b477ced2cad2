"""Tensor (model) parallelism for the X3D fine tower.

The XL fine tower (``x3d_fine.py:388-400``: 55 bottlenecks, 630-wide stage-4
expansions) is the serving-latency and memory heavyweight — extract-time it
processes every 4-frame window of a video.  This module shards it
Megatron-style over a ``model`` mesh axis so one video's tower runs across
chips:

* ``conv1`` (1×1×1 expand) is **column-parallel** — its output channels
  (``mid_planes``) shard over ``model``; the depthwise ``conv2``, BN affine,
  and the Swish stay elementwise in channels, so the whole mid-section runs
  on local shards with zero communication;
* the SE block is a row→column pair — ``fc1`` contracts over the sharded
  channels (one tiny ``psum`` of the squeezed ``(B, 1, 1, 1, width)``
  vector), ``fc2`` re-emits the sharded gate;
* ``conv3`` (1×1×1 project) is **row-parallel** — it contracts over the
  sharded ``mid`` axis, and the partitioner inserts the block's one
  significant all-reduce on the (4–14× narrower) ``out_planes`` tensor;
* everything between blocks (residuals, stage taps, the global-tower pools)
  stays replicated, so checkpoints, the fusion pipeline, and the serving
  surface are unchanged.

Only the parameters carry sharding annotations — XLA's SPMD partitioner
propagates them through the conv/elementwise graph and places the
collectives (the `"How to Scale Your Model"` recipe: pick a mesh, annotate,
let XLA insert the psums).  Non-divisible channel counts (X3D-M's mid=54
over 4 chips) are legal: GSPMD pads the uneven shard.

Use with the plain trunk (XLA convs — the partitioner knows their
factorisations); the fold4 Pallas stencil kernels register batch-axis
partitioning only (``ops/pallas/dw_fold.py``) and are a data-parallel
surface.  ``FineNet(trunk_layout="plain", stem_s2d=True)`` keeps the stem
MXU-friendly.

Reference scope: the reference has no model parallelism at all — its only
multi-GPU story is ``nn.DataParallel`` batch splitting
(``train_fine.py:123``).  This is a new TPU capability, not a port.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_mesh2d(n_data: int, n_model: int,
                devices: Optional[Sequence] = None) -> Mesh:
    """``(data, model)`` mesh.  Axis order puts ``model`` minor so its
    all-reduces ride the fastest ICI links within a host's chip group."""
    if devices is None:
        devices = jax.devices()
    n = n_data * n_model
    assert len(devices) >= n, (len(devices), n)
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_model),
                (DATA_AXIS, MODEL_AXIS))


def _tower_spec(path: Tuple[str, ...], value: Any) -> P:
    """PartitionSpec for one fine-tower parameter.

    Column-parallel: ``conv1`` kernel, SE ``fc2`` kernel+bias, and the
    depthwise ``conv2`` kernel (its channels follow ``conv1``'s output).
    Row-parallel: ``conv3`` and SE ``fc1`` kernels (contract the sharded
    axis).  The head repeats the pattern one level up: ``conv5`` expands
    (column), ``fc1`` contracts (row).  Everything else — stem, BN/affine
    vectors, downsample convs, logits ``fc2`` — replicates; GSPMD slices
    replicated vectors locally, so the elementwise BN ops stay
    communication-free.
    """
    names = set(path)
    leaf = path[-1]
    ndim = getattr(value, "ndim", 0)
    if leaf == "kernel" and ndim == 5:
        if "conv1" in names or "conv5" in names:
            return P(None, None, None, None, MODEL_AXIS)   # column
        if "conv2" in names:
            return P(None, None, None, None, MODEL_AXIS)   # depthwise, local
        if "conv3" in names:
            return P(None, None, None, MODEL_AXIS, None)   # row
        if "se" in names:
            return (P(None, None, None, MODEL_AXIS, None) if "fc1" in names
                    else P(None, None, None, None, MODEL_AXIS))
        if "fc1" in names:   # head fc1: contracts conv5's sharded output
            return P(None, None, None, MODEL_AXIS, None)
    if leaf == "bias" and "se" in names and "fc2" in names:
        return P(MODEL_AXIS)
    return P()


def tower_param_specs(variables: Any) -> Any:
    """Pytree of :class:`PartitionSpec` matching ``variables`` (all
    collections — ``batch_stats`` vectors replicate)."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    specs = {}
    for kp, v in flat:
        path = tuple(getattr(k, "key", str(k)) for k in kp)
        specs[path] = _tower_spec(path, v)
    treedef = jax.tree_util.tree_structure(variables)
    ordered = [specs[tuple(getattr(k, "key", str(k)) for k in kp)]
               for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, ordered)


def shard_tower_variables(variables: Any, mesh: Mesh) -> Any:
    """Place tower variables with their TP shardings over ``mesh``."""
    specs = tower_param_specs(variables)
    return jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        variables, specs)


def tp_tower_apply(model, mesh: Mesh):
    """``(variables, clips) -> features`` jitted with TP param shardings and
    batch rows sharded over ``data``.  ``variables`` must already be placed
    by :func:`shard_tower_variables` (jit then reuses the committed
    shardings without a resharding copy)."""
    data_sh = NamedSharding(mesh, P(DATA_AXIS))

    def apply_fn(variables, clips):
        return model.apply(variables, clips, False)

    return jax.jit(apply_fn), data_sh
