"""Tensor-parallel fine tower (parallel/tensor.py): Megatron-style channel
sharding over a ``model`` mesh axis with zero-padded non-divisible widths,
outputs matching the replicated tower.

The reference has no model parallelism (``train_fine.py:123`` is plain
DataParallel); this is the TPU-native XL-serving surface."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from coarse_fine_networks_tpu.models import FineNet
from coarse_fine_networks_tpu.models.x3d import get_inplanes
from coarse_fine_networks_tpu.parallel.tensor import (
    MODEL_AXIS,
    make_mesh2d,
    make_tp_tower,
    pad_tower_variables,
    shard_tower_variables,
    tower_param_specs,
    tp_param_bytes,
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


def test_padded_tower_matches_unpadded_single_device():
    """channel_pad=4 clone + zero-padded variables == the original tower on
    ONE device (no mesh: proves the inert-padding algebra on its own)."""
    model = _tower()
    variables, clips = _init(model)
    ref = jax.jit(lambda v, c: model.apply(v, c, False))(variables, clips)

    tp_model = model.clone(channel_pad=4)
    shapes = jax.eval_shape(
        lambda: tp_model.init({"params": jax.random.PRNGKey(0)}, clips,
                              False))
    padded = pad_tower_variables(variables, shapes)
    # mid=54 pads to 56
    k = padded["params"]["layer1"]["block0"]["conv1"]["kernel"]
    assert k.shape[-1] == 56
    assert float(jnp.abs(k[..., 54:]).max()) == 0.0
    out = jax.jit(lambda v, c: tp_model.apply(v, c, False))(padded, clips)
    for key in ref:
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   rtol=2e-5, atol=2e-5)


def test_padded_shapes_divide_model_axis_all_versions():
    """Every sharded dim of the padded tower divides the axis, for M and XL
    (mids 54 / 72,162,306,630) on 4- and 8-way axes — shape-level only, so
    XL stays cheap (jax.eval_shape, no FLOPs)."""
    for version in ("M", "XL"):
        model = _tower(version=version)
        clips = jax.ShapeDtypeStruct((1, 2, 32, 32, 3), jnp.float32)
        for n_model in (4, 8):
            tp_model = model.clone(channel_pad=n_model)
            shapes = jax.eval_shape(
                lambda c, m=tp_model: m.init(
                    {"params": jax.random.PRNGKey(0)}, c, False),
                clips)
            specs = tower_param_specs(shapes)
            flat_v = jax.tree_util.tree_flatten_with_path(shapes)[0]
            flat_s = jax.tree.leaves(
                specs, is_leaf=lambda x: isinstance(x, P))
            n_sharded = 0
            for (kp, v), s in zip(flat_v, flat_s):
                for dim, name in enumerate(s):
                    if name == MODEL_AXIS:
                        assert v.shape[dim] % n_model == 0, (
                            version, n_model, kp, v.shape, dim)
                        n_sharded += 1
            assert n_sharded > 50  # the whole trunk is actually sharded


def test_shard_tower_variables_rejects_non_divisible():
    """Placement without padding gets a clear error pointing at
    make_tp_tower, not a raw device_put ValueError."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    model = _tower()
    variables, _ = _init(model)
    with pytest.raises(ValueError, match="make_tp_tower"):
        shard_tower_variables(variables, make_mesh2d(2, 4))


def test_tp_tower_matches_replicated(mesh2d):
    """2x4 (data x model) mesh: the sharded tower's global-tower features
    match the single-device tower at f32 tolerance, for the non-divisible
    X3D-M channel counts (mid=54 -> zero-padded to 56 over 4 shards)."""
    model = _tower()
    variables, clips = _init(model)
    ref = jax.jit(lambda v, c: model.apply(v, c, False))(variables, clips)

    tp_model, tp_vars = make_tp_tower(model, variables, mesh2d, clips)
    k = tp_vars["params"]["layer1"]["block0"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, None, MODEL_AXIS)
    assert k.shape[-1] == 56  # 54 padded to the 4-way axis

    apply_tp, data_sh = tp_tower_apply(tp_model, mesh2d)
    out = apply_tp(tp_vars, jax.device_put(clips, data_sh))
    assert set(out) == set(ref)
    for key in ref:
        assert out[key].shape == ref[key].shape
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

    tp_model, tp_vars = make_tp_tower(model, variables, mesh2d, clips)
    apply_tp = jax.jit(lambda v, c: tp_model.apply(
        v, c, False, rngs={"dropout": jax.random.PRNGKey(1)}))
    _, data_sh = tp_tower_apply(tp_model, mesh2d)
    out = apply_tp(tp_vars, jax.device_put(clips, data_sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_pure_model_axis_mesh():
    """1x8 mesh — pure tensor parallelism (single-video XL serving shape:
    batch too small to data-shard); mid=54 pads to 56 over 8 shards."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh2d(1, 8)
    model = _tower()
    variables, clips = _init(model, b=1)
    ref = jax.jit(lambda v, c: model.apply(v, c, False))(variables, clips)
    tp_model, tp_vars = make_tp_tower(model, variables, mesh, clips)
    apply_tp, data_sh = tp_tower_apply(tp_model, mesh)
    out = apply_tp(tp_vars, jax.device_put(clips, data_sh))
    for key in ref:
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_tp_xl_tower_matches_replicated(mesh2d):
    """The module's stated purpose: the XL tower (55 blocks, mids
    72/162/306/630 — none divide 4 except 72) runs tensor-parallel with
    channel padding and matches replicated.  Tiny input keeps CPU cost
    bounded; marked slow (55-block compile)."""
    model = _tower(version="XL")
    variables, clips = _init(model, b=2, t=2, hw=32)
    ref = jax.jit(lambda v, c: model.apply(v, c, False))(variables, clips)
    tp_model, tp_vars = make_tp_tower(model, variables, mesh2d, clips)
    # stage-2 mid 162 -> 164; head 630 -> 632
    k = tp_vars["params"]["layer2"]["block0"]["conv1"]["kernel"]
    assert k.shape[-1] == 164
    assert tp_vars["params"]["head"]["conv5"]["kernel"].shape[-1] == 632
    apply_tp, data_sh = tp_tower_apply(tp_model, mesh2d)
    out = apply_tp(tp_vars, jax.device_put(clips, data_sh))
    for key in ref:
        assert out[key].shape == ref[key].shape  # padding sliced off
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   rtol=5e-5, atol=5e-5)


def test_tp_param_bytes_reduction(mesh2d):
    """TP's point is memory: per-device sharded bytes for the M tower are
    well under replicated (the sharded mid-section dominates)."""
    model = _tower()
    variables, clips = _init(model)
    tp_model, tp_vars = make_tp_tower(model, variables, mesh2d, clips)
    host_vars = jax.tree.map(np.asarray, tp_vars)
    total, per_dev = tp_param_bytes(host_vars, mesh2d)
    assert per_dev < total
    # most tower params are in sharded convs; expect close to 1/4 + the
    # replicated remainder (stem, BN vectors, downsample, dense head)
    assert per_dev / total < 0.55, per_dev / total
    # and every addressable shard of a sharded tensor really is 1/4 size
    k = tp_vars["params"]["layer4"]["block0"]["conv1"]["kernel"]
    assert k.addressable_shards[0].data.shape[-1] == k.shape[-1] // 4
