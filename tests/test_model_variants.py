"""Coverage of the model configuration space: classification task, t_pool
variants, non-mixing fusion, multi-crop testing, remat, and version tables."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.models import (
    CoarseNet,
    FineNet,
    get_blocks,
    get_inplanes,
    round_width,
)
from coarse_fine_networks_tpu.models.surgery import replace_logits, update_bn_splits


def _feats(b, tf, rng):
    return {
        k: jnp.asarray(rng.rand(b, tf, 7, 7, c), jnp.float32)
        for k, c in [("layer1", 24), ("layer2", 48), ("layer3", 96),
                     ("layer4", 192), ("conv5", 432)]
    }


def test_version_tables_match_reference():
    assert get_inplanes("M") == [(54, 24), (108, 48), (216, 96), (432, 192)]
    assert get_inplanes("XL") == [(72, 32), (162, 72), (306, 136), (630, 280)]
    assert get_blocks("M") == [3, 5, 11, 7]
    assert get_blocks("XL") == [5, 10, 25, 15]
    # SE squeeze widths (multiplier 0.0625, x3d_fine.py:132-143)
    assert round_width(54) == 8
    assert round_width(216) == 16
    assert round_width(432) == 32


@pytest.mark.slow
def test_fine_class_task_and_extract_feat():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 56, 56, 3), jnp.float32)
    m = FineNet(version="M", n_classes=11, task="class")
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, False))()
    out = jax.jit(lambda v, x: m.apply(v, x, False))(v, x)
    assert out.shape == (2, 1, 11)  # B 1 C — clip-level logits

    me = FineNet(version="M", n_classes=11, task="loc", extract_feat=True)
    ve = jax.jit(lambda: me.init({"params": jax.random.PRNGKey(0)}, x, False))()
    feat = jax.jit(lambda v, x: me.apply(v, x, False))(ve, x)
    assert feat.shape == (2, 8, 1, 1, 432)


@pytest.mark.slow
@pytest.mark.parametrize("t_pool", ["avg", "max", "stride"])
def test_coarse_t_pool_variants(t_pool):
    rng = np.random.RandomState(0)
    b, t, tf = 1, 8, 12
    x = jnp.asarray(rng.rand(b, t, 56, 56, 3), jnp.float32)
    feats = _feats(b, tf, rng)
    fm = jnp.ones((b, tf))
    meta = jnp.asarray([[0, t, 2 * t, 1]], jnp.int32)
    m = CoarseNet(version="M", n_classes=9, t_pool=t_pool, is_mixing=True)
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, feats,
                               fm, meta, False))()
    out = jax.jit(lambda v: m.apply(v, x, feats, fm, meta, False))(v)
    assert out.shape == (b, t // 4, 9)  # pooled T, no unpool
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_coarse_non_mixing_path():
    rng = np.random.RandomState(1)
    b, t, tf = 1, 8, 12
    x = jnp.asarray(rng.rand(b, t, 224, 224, 3), jnp.float32)
    feats = _feats(b, tf, rng)
    fm = jnp.ones((b, tf))
    meta = jnp.asarray([[0, t, 2 * t, 1]], jnp.int32)
    m = CoarseNet(version="M", n_classes=9, t_pool="grid", is_mixing=False)
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, feats,
                               fm, meta, False))()
    out = jax.jit(lambda v: m.apply(v, x, feats, fm, meta, False))(v)
    assert out.shape == (1, (t // 4 + 1 - 1) * 4, 9)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_coarse_multicrop_eval():
    """crops=2: coarse batch carries 2 clips/sample; fine feats stay
    per-sample and are repeated inside the net (x3d_coarse.py:209-211,
    264-266)."""
    rng = np.random.RandomState(2)
    b, crops, t, tf = 2, 2, 8, 12
    x = jnp.asarray(rng.rand(b * crops, t, 56, 56, 3), jnp.float32)
    feats = _feats(b, tf, rng)
    fm = jnp.ones((b, tf))
    meta = jnp.asarray([[0, t, 2 * t, 1], [2, t, 3 * t, 1]], jnp.int32)
    m = CoarseNet(version="M", n_classes=9, t_pool="grid", is_mixing=True,
                  crops=crops)
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, feats,
                               fm, meta, False))()
    out = jax.jit(lambda v: m.apply(v, x, feats, fm, meta, False))(v)
    assert out.shape[0] == b * crops
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_remat_stage_matches_plain():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 4, 28, 28, 3), jnp.float32)
    m1 = FineNet(version="M", n_classes=5, task="loc", remat=False)
    m2 = FineNet(version="M", n_classes=5, task="loc", remat=True)
    v = jax.jit(lambda: m1.init({"params": jax.random.PRNGKey(0)}, x, False))()
    o1 = jax.jit(lambda v, x: m1.apply(v, x, False))(v, x)
    o2 = jax.jit(lambda v, x: m2.apply(v, x, False))(v, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5,
                               atol=2e-5)
    # gradients flow through the remat path
    def loss(p):
        return jnp.sum(m2.apply({"params": p, "batch_stats": v["batch_stats"]},
                                x, False) ** 2)
    g = jax.jit(jax.grad(loss))(v["params"])
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))


def test_replace_logits_fine_and_coarse():
    rng = jax.random.PRNGKey(0)
    params = {
        "fc2": {"kernel": jnp.zeros((2048, 400)), "bias": jnp.zeros((400,))},
        "rw6": {
            "fc1": {"kernel": jnp.zeros((432, 432)), "bias": jnp.zeros(432)},
            "fc2": {"kernel": jnp.zeros((432, 400)), "bias": jnp.zeros(400)},
            "fc3": {"kernel": jnp.zeros((432, 432)), "bias": jnp.zeros(432)},
            "fc4": {"kernel": jnp.zeros((432, 400)), "bias": jnp.zeros(400)},
        },
    }
    out = replace_logits(params, 157, rng, "coarse")
    assert out["fc2"]["kernel"].shape == (2048, 157)
    assert out["rw6"]["fc2"]["kernel"].shape == (432, 157)
    assert out["rw6"]["fc4"]["bias"].shape == (157,)
    assert out["rw6"]["fc1"]["kernel"].shape == (432, 432)  # untouched
    assert float(jnp.abs(out["fc2"]["kernel"]).max()) > 0


def test_update_bn_splits():
    stats = {"bn1": {"mean": jnp.zeros(4), "var": jnp.ones(4),
                     "split_mean": jnp.ones(8), "split_var": jnp.ones(8)}}
    out = update_bn_splits(stats, scale=2)
    assert out["bn1"]["split_mean"].shape == (16,)
    assert float(out["bn1"]["split_mean"].sum()) == 0.0
    assert float(out["bn1"]["split_var"].sum()) == 16.0


def test_long_cycle_schedule():
    from coarse_fine_networks_tpu.train.multigrid import LongCycleSchedule

    sched = LongCycleSchedule(base_frames=320, base_crop=224, base_batch=8)
    f0, c0, b0 = sched.shapes(0)
    assert (f0, b0) == (80, 64) and c0 <= 224
    f3, c3, b3 = sched.shapes(3)
    assert (f3, c3, b3) == (320, 224, 8)
    stats = {"bn1": {"mean": jnp.zeros(4), "var": jnp.ones(4),
                     "split_mean": jnp.zeros(4), "split_var": jnp.ones(4)}}
    new_stats, scale = sched.transition(0, stats)
    assert scale == 8
    assert new_stats["bn1"]["split_mean"].shape == (32,)


def test_s2d_stem_exact():
    """Space-to-depth stem == plain stem with the same parameters."""
    from coarse_fine_networks_tpu.models.x3d import X3DStem

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), jnp.float32)
    m1 = X3DStem(24, s2d=False)
    m2 = X3DStem(24, s2d=True)
    v = m1.init({"params": jax.random.PRNGKey(0)}, x, False)
    o1 = m1.apply(v, x, False)
    o2 = m2.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5,
                               atol=1e-6)
    # gradient flows to the canonical conv1_s kernel
    g = jax.grad(lambda p: jnp.sum(
        m2.apply({"params": p, "batch_stats": v["batch_stats"]},
                 x, False) ** 2))(v["params"])
    assert np.abs(np.asarray(g["conv1_s"]["kernel"])).max() > 0
