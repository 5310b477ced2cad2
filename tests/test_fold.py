"""Fold4-layout parity: the folded stem/stage must be numerically equivalent
to the plain modules given the *same* parameters (checkpoint compatibility is
the contract — fold is a layout, not a different model)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.models.layers import SqueezeExcite, SubBatchNorm
from coarse_fine_networks_tpu.models.x3d import Bottleneck, X3DStage, X3DStem
from coarse_fine_networks_tpu.models.x3d_fold import (
    FoldedBottleneck,
    FoldedSqueezeExcite,
    FoldedStage,
    FoldedStem,
    FoldedSubBatchNorm,
    fold_downsample_pw,
)
from coarse_fine_networks_tpu.ops.fold import (
    fold_matmul,
    fold_pad,
    fold_pointwise_kernel,
    fold_input_clips,
    from_fold4,
    to_fold4,
)


def test_fold_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 3, 16, 12, 54), jnp.float32)
    xf = to_fold4(x)
    assert xf.shape == (2, 3, 4, 12, 4 * 64)
    np.testing.assert_array_equal(np.asarray(from_fold4(xf, 54)),
                                  np.asarray(x))
    # pad lanes are zero
    v = np.asarray(xf).reshape(2, 3, 4, 12, 4, 64)
    assert np.all(v[..., 54:] == 0)


def test_fold_pointwise_matches_plain():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 3, 8, 12, 24), jnp.float32)
    w = jnp.asarray(rng.randn(1, 1, 1, 24, 54), jnp.float32)
    ref = jnp.einsum("bthwc,co->bthwo", x, w[0, 0, 0])
    got = from_fold4(fold_matmul(to_fold4(x), fold_pointwise_kernel(w, 24, 54)),
                     54)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_fold_downsample_matches_strided_conv():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 3, 16, 12, 24), jnp.float32)
    w = jnp.asarray(rng.randn(1, 1, 1, 24, 24), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 2, 2), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = from_fold4(fold_downsample_pw(to_fold4(x), w, 24, 24), 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("splits", [1, 2])
def test_folded_subbn_matches_plain(splits):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 3, 8, 6, 54), jnp.float32)
    plain = SubBatchNorm(54, splits)
    fold = FoldedSubBatchNorm(54, splits)
    vp = plain.init({"params": jax.random.PRNGKey(0)}, x, True)
    # same param tree
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(
        fold.init({"params": jax.random.PRNGKey(0)}, to_fold4(x), True))
    vp = jax.tree.map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / a.size, vp)

    ref, upd_p = plain.apply(vp, x, True, mutable=["batch_stats"])
    got_f, upd_f = fold.apply(vp, to_fold4(x), True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(from_fold4(got_f, 54)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        upd_p["batch_stats"], upd_f["batch_stats"])

    ref_e = plain.apply(vp, x, False)
    got_e = fold.apply(vp, to_fold4(x), False)
    np.testing.assert_allclose(np.asarray(from_fold4(got_e, 54)),
                               np.asarray(ref_e), rtol=2e-5, atol=2e-5)


def test_folded_subbn_pre_matmul_stats():
    """Train-mode ``pre_matmul`` Gram stats (the lane second-moment identity
    E[(xW)²] = (Wᵀ E[xxᵀ] W)_oo) == stats of the materialised product: same
    (sc, bi) fused vectors and same running-stat updates."""
    from coarse_fine_networks_tpu.ops.fold import (fold_matmul,
                                                   fold_pointwise_kernel)

    rng = np.random.RandomState(13)
    c_in, c_mid = 24, 54
    x = jnp.asarray(rng.randn(4, 3, 8, 6, c_in), jnp.float32)
    w1 = jnp.asarray(rng.randn(1, 1, 1, c_in, c_mid) / 5, jnp.float32)
    wmm = fold_pointwise_kernel(w1, c_in, c_mid)
    xf = to_fold4(x)
    prod = fold_matmul(xf, wmm)

    bn = FoldedSubBatchNorm(c_mid, 1)
    v = bn.init({"params": jax.random.PRNGKey(0)}, prod, True)
    (sc_r, bi_r), up_r = bn.apply(v, prod, True, scale_bias=True,
                                  mutable=["batch_stats"])
    (sc_g, bi_g), up_g = bn.apply(v, xf, True, scale_bias=True,
                                  pre_matmul=wmm, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(sc_g), np.asarray(sc_r), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(bi_g), np.asarray(bi_r), rtol=2e-5,
                               atol=2e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        up_r["batch_stats"], up_g["batch_stats"])


def test_folded_se_matches_plain():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 3, 8, 6, 54), jnp.float32)
    plain = SqueezeExcite(54)
    fold = FoldedSqueezeExcite(54)
    vp = plain.init({"params": jax.random.PRNGKey(1)}, x)
    vf = fold.init({"params": jax.random.PRNGKey(1)}, to_fold4(x))
    assert (jax.tree_util.tree_structure(vp)
            == jax.tree_util.tree_structure(vf))
    ref = plain.apply(vp, x)
    got = fold.apply(vp, to_fold4(x))
    np.testing.assert_allclose(np.asarray(from_fold4(got, 54)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("stride,use_se,ds", [(1, True, False),
                                              (2, True, True),
                                              (1, False, False),
                                              (1, True, True)])
def test_folded_bottleneck_matches_plain(stride, use_se, ds):
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 4, 16, 16, 24), jnp.float32)
    plain = Bottleneck(mid_planes=54, out_planes=24, stride=stride,
                       use_se=use_se, has_downsample=ds, bn_splits=1)
    fold = FoldedBottleneck(in_planes=24, mid_planes=54, out_planes=24,
                            stride=stride, use_se=use_se, has_downsample=ds,
                            bn_splits=1)
    vp = plain.init({"params": jax.random.PRNGKey(2)}, x, True)
    vf = fold.init({"params": jax.random.PRNGKey(2)}, to_fold4(x), True)
    assert (jax.tree_util.tree_structure(vp)
            == jax.tree_util.tree_structure(vf)), (
        jax.tree_util.tree_structure(vp), jax.tree_util.tree_structure(vf))

    ref, up = plain.apply(vp, x, True, mutable=["batch_stats"])
    got, uf = fold.apply(vp, to_fold4(x), True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(from_fold4(got, 24)),
                               np.asarray(ref), rtol=5e-5, atol=5e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5),
        up["batch_stats"], uf["batch_stats"])


def test_folded_stage_matches_plain():
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(2, 4, 16, 16, 24), jnp.float32)
    plain = X3DStage(mid_planes=54, out_planes=24, num_blocks=3, stride=2)
    fold = FoldedStage(in_planes=24, mid_planes=54, out_planes=24,
                       num_blocks=3, stride=2)
    vp = plain.init({"params": jax.random.PRNGKey(3)}, x, True)
    ref = plain.apply(vp, x, False)
    got = fold.apply(vp, to_fold4(x), False)
    np.testing.assert_allclose(np.asarray(from_fold4(got, 24)),
                               np.asarray(ref), rtol=5e-5, atol=5e-5)


def test_folded_stem_matches_plain():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 8, 32, 32, 3), jnp.float32)
    plain = X3DStem(planes=24, s2d=True)
    fold = FoldedStem(planes=24)
    vp = plain.init({"params": jax.random.PRNGKey(4)}, x, True)
    vf = fold.init({"params": jax.random.PRNGKey(4)}, x, True)
    assert (jax.tree_util.tree_structure(vp)
            == jax.tree_util.tree_structure(vf))
    ref = plain.apply(vp, x, False)
    got = fold.apply(vp, x, False)
    np.testing.assert_allclose(np.asarray(from_fold4(got, 24)),
                               np.asarray(ref), rtol=5e-5, atol=5e-5)


def test_fold_input_clips_shape():
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.rand(1, 2, 16, 16, 3), jnp.float32)
    xp = fold_input_clips(x)
    assert xp.shape == (1, 2, 4, 4, 128)
    v = np.asarray(xp).reshape(1, 2, 4, 4, 4, 4, 8)
    np.testing.assert_array_equal(v[0, 1, 1, 2, 3, 1, :3],
                                  np.asarray(x)[0, 1, 4 * 1 + 3, 4 * 2 + 1])
    assert np.all(v[..., 3:] == 0)


@pytest.mark.parametrize("hw", [8, 16])
def test_folded_gridpool_matches_plain(hw):
    """GridPool with fold4 input (scattered conv1 + fold-space resample)
    equals the plain module on the same canonical parameters."""
    from coarse_fine_networks_tpu.models import GridPool

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.rand(2, 8, hw, hw, 24), jnp.float32)
    plain = GridPool(24)
    fold = GridPool(24, fold_c=24)
    vp = plain.init({"params": jax.random.PRNGKey(8)}, x, True)
    vf = fold.init({"params": jax.random.PRNGKey(8)}, to_fold4(x), True)
    assert (jax.tree_util.tree_structure(vp)
            == jax.tree_util.tree_structure(vf))
    vp = jax.tree.map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / a.size, vp)

    (ref, kref), up = plain.apply(vp, x, True, mutable=["batch_stats"])
    (got, kgot), uf = fold.apply(vp, to_fold4(x), True,
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(kgot), np.asarray(kref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(from_fold4(got, 24)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        up["batch_stats"], uf["batch_stats"])

    (ref_e, _), = [plain.apply(vp, x, False)]
    (got_e, _), = [fold.apply(vp, to_fold4(x), False)]
    np.testing.assert_allclose(np.asarray(from_fold4(got_e, 24)),
                               np.asarray(ref_e), rtol=2e-5, atol=2e-5)


def test_coarse_net_fold4_matches_plain():
    """Full CoarseNet with trunk_layout='fold4' equals the plain model on the
    same variables (init with plain, apply with fold)."""
    from coarse_fine_networks_tpu.models import CoarseNet

    rng = np.random.RandomState(10)
    b, t, h, tf = 1, 8, 32, 8
    kw = dict(version="M", n_classes=11, task="loc", t_pool="grid",
              learned_mixing=True, is_mixing=True)
    plain = CoarseNet(**kw)
    fold = CoarseNet(**kw, trunk_layout="fold4")
    x = jnp.asarray(rng.rand(b, t, h, h, 3), jnp.float32)
    feats = {k: jnp.asarray(rng.rand(b, tf, 7, 7, c), jnp.float32)
             for k, c in [("layer1", 24), ("layer2", 48), ("layer3", 96),
                          ("layer4", 192), ("conv5", 432)]}
    fm = jnp.ones((b, tf), jnp.float32)
    meta = jnp.asarray([[0, t, 2 * t, 1]], jnp.int32)
    v = plain.init({"params": jax.random.PRNGKey(6)}, x, feats, fm, meta,
                   False)
    vf = fold.init({"params": jax.random.PRNGKey(6)}, x, feats, fm, meta,
                   False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vf))
    ref = plain.apply(v, x, feats, fm, meta, False)
    got = fold.apply(v, x, feats, fm, meta, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_fine_net_fold4_matches_plain():
    from coarse_fine_networks_tpu.models import FineNet

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(1, 8, 32, 32, 3), jnp.float32)
    plain = FineNet(version="M", n_classes=11, task="loc")
    fold = FineNet(version="M", n_classes=11, task="loc",
                   trunk_layout="fold4")
    v = plain.init({"params": jax.random.PRNGKey(7)}, x, False)
    ref = plain.apply(v, x, False)
    got = fold.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("stride", [1, 2])
def test_folded_bottleneck_fused_train_matches_plain(stride):
    """The TRAIN-mode fused bottleneck entry (dw_impl='interpret' routes
    bn1 through the closed-form composite, dw_fold4_mm_bn_train): forward,
    the bn1 running-stat update, and grads to every canonical parameter all
    match the plain module."""
    rng = np.random.RandomState(17)
    x = jnp.asarray(rng.rand(2, 3, 16, 16, 24), jnp.float32)
    plain = Bottleneck(mid_planes=54, out_planes=24, stride=stride,
                       use_se=True, has_downsample=(stride == 2),
                       bn_splits=1)
    fold = FoldedBottleneck(in_planes=24, mid_planes=54, out_planes=24,
                            stride=stride, use_se=True,
                            has_downsample=(stride == 2), bn_splits=1,
                            dw_impl="interpret")
    vp = plain.init({"params": jax.random.PRNGKey(4)}, x, True)
    vf = fold.init({"params": jax.random.PRNGKey(4)}, to_fold4(x), True)
    assert (jax.tree_util.tree_structure(vp)
            == jax.tree_util.tree_structure(vf))

    ref, up = plain.apply(vp, x, True, mutable=["batch_stats"])
    got, uf = fold.apply(vp, to_fold4(x), True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(from_fold4(got, 24)),
                               np.asarray(ref), rtol=5e-4, atol=5e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4),
        up["batch_stats"], uf["batch_stats"])

    def loss_plain(p):
        out, _ = plain.apply({"params": p,
                              "batch_stats": vp["batch_stats"]},
                             x, True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    def loss_fold(p):
        out, _ = fold.apply({"params": p,
                             "batch_stats": vp["batch_stats"]},
                            to_fold4(x), True, mutable=["batch_stats"])
        return jnp.sum(from_fold4(out, 24) ** 2)

    gp = jax.grad(loss_plain)(vp["params"])
    gf = jax.grad(loss_fold)(vp["params"])
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(gp)[0],
            jax.tree_util.tree_flatten_with_path(gf)[0]):
        a, b = np.asarray(a), np.asarray(b)
        # tolerance floor 3e-4: the fused composite sits within the same
        # numeric spread of the plain module as the unfused fold path does
        # (measured: 1.9e-4 vs 1.7e-4 worst-abs on bn1.scale)
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=3e-4 * max(np.abs(a).max(), 1.0),
            err_msg=str(path))


def test_folded_bottleneck_gradients_flow():
    """Gradients reach every canonical parameter through the fold
    rearrangements (each weight appears 4x in the folded kernel)."""
    rng = np.random.RandomState(9)
    x = to_fold4(jnp.asarray(rng.rand(2, 4, 8, 8, 24), jnp.float32))
    fold = FoldedBottleneck(in_planes=24, mid_planes=54, out_planes=24,
                            stride=1, use_se=True, has_downsample=False)
    v = fold.init({"params": jax.random.PRNGKey(5)}, x, True)

    def loss(p):
        out, _ = fold.apply({"params": p, "batch_stats": v["batch_stats"]},
                            x, True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_flatten_with_path(g)[0]
    for path, leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all(), path
        assert float(jnp.abs(leaf).max()) > 0, path


def test_stem_s2d_input_matches_internal_s2d():
    """FoldedStem(s2d_input=True) on s2d_pack'ed clips == the stem doing its
    own space-to-depth — the step half of the pre-s2d input fast path
    (the producer half is device_normalize_s2d)."""
    from coarse_fine_networks_tpu.models.x3d_fold import s2d_pack

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), jnp.float32)
    stem = FoldedStem(planes=24)
    stem_pre = FoldedStem(planes=24, s2d_input=True)
    v = stem.init({"params": jax.random.PRNGKey(3)}, x, True)
    ref = stem.apply(v, x, False)
    got = stem_pre.apply(v, s2d_pack(x), False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_device_normalize_s2d_matches_unfused():
    """device_normalize_s2d == s2d_pack(mask * device_normalize) — the
    producer half of the stem_s2d_input path (flip + mask + pack fused into
    one program emitting the stem's preferred layout)."""
    from coarse_fine_networks_tpu.data.transforms import (
        device_normalize,
        device_normalize_s2d,
    )
    from coarse_fine_networks_tpu.models.x3d_fold import s2d_pack

    rng = np.random.RandomState(12)
    u8 = jnp.asarray(rng.randint(0, 256, (2, 4, 16, 16, 3)), jnp.uint8)
    flip = np.asarray([True, False])
    cm = np.ones((2, 4), np.float32)
    cm[1, 3] = 0.0
    ref = device_normalize(u8, flip)
    ref = s2d_pack(ref * jnp.asarray(cm)[:, :, None, None, None])
    got = device_normalize_s2d(u8, flip, cm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_coarse_net_stem_s2d_input_matches():
    """CoarseNet(stem_s2d_input=True) end-to-end == the default fold4 net on
    the same (pre-packed) clips."""
    from coarse_fine_networks_tpu.models import CoarseNet
    from coarse_fine_networks_tpu.models.x3d_fold import s2d_pack

    rng = np.random.RandomState(13)
    b, t, hw, tf, n = 1, 8, 32, 8, 5
    clips = jnp.asarray(rng.rand(b, t, hw, hw, 3), jnp.float32)
    feats = {k: jnp.asarray(rng.rand(b, tf, 7, 7, c), jnp.float32)
             for k, c in [("layer1", 24), ("layer2", 48), ("layer3", 96),
                          ("layer4", 192), ("conv5", 432)]}
    fm = jnp.ones((b, tf), jnp.float32)
    meta = jnp.asarray([[0, t, tf, 1]] * b, jnp.int32)
    kw = dict(version="M", n_classes=n, task="loc", t_pool="grid",
              learned_mixing=True, is_mixing=True)
    m0 = CoarseNet(trunk_layout="fold4", **kw)
    m1 = CoarseNet(trunk_layout="fold4", stem_s2d_input=True, **kw)
    v = jax.jit(lambda: m0.init({"params": jax.random.PRNGKey(0)}, clips,
                                feats, fm, meta, False))()
    ref = jax.jit(lambda v: m0.apply(v, clips, feats, fm, meta, False))(v)
    got = jax.jit(lambda v: m1.apply(v, s2d_pack(clips), feats, fm, meta,
                                     False))(v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
