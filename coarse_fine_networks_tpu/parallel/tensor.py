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
let XLA insert the psums).

**Non-divisible channel counts are padded, not left uneven.**  JAX rejects a
``NamedSharding`` whose sharded dim doesn't divide the axis (both for
``jax.device_put`` placement and for jit in/out shardings), and X3D's mid
widths rarely divide a 4/8-way axis (M: 54; XL: 162, 306, 630).
:func:`make_tp_tower` therefore clones the model with
``channel_pad=model_axis`` — every mid/head width rounds up to the axis
multiple — and zero-fills the padded parameter slots
(:func:`pad_tower_variables`).  The zero slots are exactly inert in eval
mode: zero conv1 columns emit zero activations, BN with
scale=bias=mean=0 / var=1 maps 0→0, depthwise conv and Swish preserve
zeros, the SE gate multiplies a zero activation, and conv3's zero rows add
nothing — so the padded tower's outputs equal the unpadded tower's up to
float summation order.  (TP is an inference/extract surface; train it
replicated or data-parallel.)

Use with the plain trunk (XLA convs — the partitioner knows their
factorisations); the fold4 Pallas stencil kernels register batch-axis
partitioning only (``ops/pallas/dw_fold.py``) and are a data-parallel
surface.  ``channel_pad > 1`` forces the plain trunk automatically
(``models/fine.py``).

Reference scope: the reference has no model parallelism at all — its only
multi-GPU story is ``nn.DataParallel`` batch splitting
(``train_fine.py:123``).  This is a new TPU capability, not a port.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
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


def _is_subbn_stats(node: Any) -> bool:
    return (isinstance(node, dict)
            and {"mean", "var", "split_mean", "split_var"} <= set(node))


def _pad_leaf(name: str, v: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    """Zero-pad ``v`` up to ``shape`` (variance slots pad with ones)."""
    if tuple(v.shape) == tuple(shape):
        return v
    assert len(v.shape) == len(shape), (name, v.shape, shape)
    fill = 1.0 if name in ("var", "split_var") else 0.0
    out = jnp.full(shape, fill, v.dtype)
    return out.at[tuple(slice(0, s) for s in v.shape)].set(v)


def pad_tower_variables(variables: Any, padded_shapes: Any) -> Any:
    """Map unpadded tower variables onto the padded tower's shapes.

    ``padded_shapes`` is the shape pytree of the ``channel_pad`` clone
    (``jax.eval_shape`` of its init).  Kernels/affine/means pad with zeros
    and variances with ones, which makes the padded channels inert (module
    docstring).  SubBN split stats are ``(num_splits*C,)`` flat — they pad
    per split, not at the tail.
    """

    def rec(src, dst):
        if _is_subbn_stats(src):
            c = src["mean"].shape[0]
            c_p = dst["mean"].shape[0]
            out = {}
            for k, v in src.items():
                tgt = dst[k].shape
                if k in ("split_mean", "split_var"):
                    s = v.shape[0] // c
                    padded = _pad_leaf(k, v.reshape(s, c), (s, c_p))
                    out[k] = padded.reshape(-1)
                    assert out[k].shape == tuple(tgt), (k, out[k].shape, tgt)
                else:
                    out[k] = _pad_leaf(k, v, tgt)
            return out
        if isinstance(src, dict):
            assert set(src) == set(dst), (set(src), set(dst))
            return {k: rec(v, dst[k]) for k, v in src.items()}
        return _pad_leaf("", src, dst.shape)

    return rec(variables, padded_shapes)


def make_tp_tower(model, variables: Any, mesh: Mesh,
                  example_clips: jax.Array) -> Tuple[Any, Any]:
    """Build the tensor-parallel tower: ``(tp_model, tp_variables)``.

    Clones ``model`` with ``channel_pad = |model axis|`` (every sharded
    channel dim then divides the axis), zero-pads ``variables`` into the
    clone's shapes, and places them with the Megatron column/row shardings.
    ``tp_model.apply(tp_variables, clips, False)`` under jit matches the
    original ``model.apply`` output (up to float summation order).
    """
    n_model = mesh.shape[MODEL_AXIS]
    tp_model = model.clone(channel_pad=n_model)
    shapes = jax.eval_shape(
        lambda c: tp_model.init({"params": jax.random.PRNGKey(0)}, c, False),
        example_clips)
    padded = pad_tower_variables(variables, shapes)
    return tp_model, shard_tower_variables(padded, mesh)


def shard_tower_variables(variables: Any, mesh: Mesh) -> Any:
    """Place tower variables with their TP shardings over ``mesh``.

    Every sharded dim must divide the ``model`` axis — go through
    :func:`make_tp_tower` (which channel-pads first) for the X3D widths
    that don't.
    """
    specs = tower_param_specs(variables)
    n_model = mesh.shape[MODEL_AXIS]

    def put(v, s):
        for dim, name in enumerate(s):
            if name == MODEL_AXIS and v.shape[dim] % n_model:
                raise ValueError(
                    f"dim {dim} of {v.shape} does not divide the {n_model}-way "
                    f"model axis; use make_tp_tower() to channel-pad first")
        return jax.device_put(v, NamedSharding(mesh, s))

    return jax.tree.map(put, variables, specs)


def tp_tower_apply(model, mesh: Mesh):
    """``(variables, clips) -> features`` jitted with TP param shardings and
    batch rows sharded over ``data``.  ``model``/``variables`` are the pair
    returned by :func:`make_tp_tower` (jit reuses the committed shardings
    without a resharding copy)."""
    data_sh = NamedSharding(mesh, P(DATA_AXIS))

    def apply_fn(variables, clips):
        return model.apply(variables, clips, False)

    return jax.jit(apply_fn), data_sh


def tp_param_bytes(variables: Any, mesh: Mesh) -> Tuple[int, int]:
    """(total_unsharded_bytes, max per-device sharded bytes) for the tower.

    The point of TP is memory: each device holds ``1/|model|`` of every
    sharded tensor.  Uses ``NamedSharding.shard_shape`` arithmetic — no
    placement needed."""
    specs = tower_param_specs(variables)
    total = 0
    per_dev = 0
    for v, s in zip(jax.tree.leaves(variables), jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(x, P))):
        nbytes = int(np.prod(v.shape)) * v.dtype.itemsize
        shard = NamedSharding(mesh, s).shard_shape(v.shape)
        total += nbytes
        per_dev += int(np.prod(shard)) * v.dtype.itemsize
    return total, per_dev
