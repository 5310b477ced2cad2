"""Tensor-parallel fine tower (parallel/tensor.py): Megatron-style channel
sharding over a ``model`` mesh axis, outputs matching the replicated tower.

The reference has no model parallelism (``train_fine.py:123`` is plain
DataParallel); this is the TPU-native XL-serving surface."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from coarse_fine_networks_tpu.models import FineNet
from coarse_fine_networks_tpu.parallel.tensor import (
    MODEL_AXIS,
    make_mesh2d,
    shard_tower_variables,
    tower_param_specs,
    tp_tower_apply,
)


def _tower(version="M", **kw):
    return FineNet(version=version, n_classes=17, task="loc",
                   global_tower=True, trunk_layout="plain", dw_impl="lax",
                   **kw)


def _init(model, b=2, t=4, hw=32):
    rng = np.random.RandomState(0)
    clips = jnp.asarray(rng.rand(b, t, hw, hw, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, clips, False)
    return variables, clips


@pytest.fixture
def mesh2d():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh2d(2, 4)


def test_param_specs_cover_the_tower():
    model = _tower()
    variables, _ = _init(model)
    specs = tower_param_specs(variables)
    flat = {
        tuple(getattr(k, "key", str(k)) for k in kp): s
        for kp, s in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    # column-parallel expand, row-parallel project, SE row->column
    assert flat[("params", "layer1", "block0", "conv1", "kernel")] \
        == P(None, None, None, None, MODEL_AXIS)
    assert flat[("params", "layer1", "block0", "conv3", "kernel")] \
        == P(None, None, None, MODEL_AXIS, None)
    assert flat[("params", "layer1", "block0", "se", "fc1", "kernel")] \
        == P(None, None, None, MODEL_AXIS, None)
    assert flat[("params", "layer1", "block0", "se", "fc2", "bias")] \
        == P(MODEL_AXIS)
    # depthwise channels follow conv1's sharded output
    assert flat[("params", "layer1", "block0", "conv2", "kernel")] \
        == P(None, None, None, None, MODEL_AXIS)
    # stem / BN vectors / residual downsample replicate
    assert flat[("params", "stem", "conv1_s", "kernel")] == P()
    assert flat[("params", "layer1", "block0", "bn1", "scale")] == P()
    assert flat[("params", "layer1", "block0", "downsample_conv",
                 "kernel")] == P()
    assert flat[("batch_stats", "layer1", "block0", "bn1", "mean")] == P()


def test_tp_tower_matches_replicated(mesh2d):
    """2x4 (data x model) mesh: the sharded tower's global-tower features
    match the single-device tower at f32 tolerance, for the non-divisible
    X3D-M channel counts (mid=54 over 4 shards -> GSPMD padding path)."""
    model = _tower()
    variables, clips = _init(model)
    ref = jax.jit(lambda v, c: model.apply(v, c, False))(variables, clips)

    tp_vars = shard_tower_variables(variables, mesh2d)
    k = tp_vars["params"]["layer1"]["block0"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, None, MODEL_AXIS)

    apply_tp, data_sh = tp_tower_apply(model, mesh2d)
    out = apply_tp(tp_vars, jax.device_put(clips, data_sh))
    assert set(out) == set(ref)
    for key in ref:
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   rtol=2e-5, atol=2e-5)


def test_tp_head_logits_match(mesh2d):
    """Full head path (conv5 column, fc1 row, logits): per-frame logits
    match the replicated model."""
    model = FineNet(version="M", n_classes=17, task="loc",
                    trunk_layout="plain", dw_impl="lax")
    variables, clips = _init(model)
    ref = jax.jit(lambda v, c: model.apply(
        v, c, False, rngs={"dropout": jax.random.PRNGKey(1)}))(
            variables, clips)

    tp_vars = shard_tower_variables(variables, mesh2d)
    apply_tp = jax.jit(lambda v, c: model.apply(
        v, c, False, rngs={"dropout": jax.random.PRNGKey(1)}))
    _, data_sh = tp_tower_apply(model, mesh2d)
    out = apply_tp(tp_vars, jax.device_put(clips, data_sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_pure_model_axis_mesh():
    """1x8 mesh — pure tensor parallelism (single-video XL serving shape:
    batch too small to data-shard)."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh2d(1, 8)
    model = _tower()
    variables, clips = _init(model, b=1)
    ref = jax.jit(lambda v, c: model.apply(v, c, False))(variables, clips)
    tp_vars = shard_tower_variables(variables, mesh)
    apply_tp, data_sh = tp_tower_apply(model, mesh)
    out = apply_tp(tp_vars, jax.device_put(clips, data_sh))
    for key in ref:
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   rtol=2e-5, atol=2e-5)
