"""Fold4-space Pallas depthwise kernel: correctness vs the XLA conv oracle
(interpret mode on CPU; the same kernel compiles on TPU), including the
custom VJP and the stride-2 wrapper."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from coarse_fine_networks_tpu.ops.fold import from_fold4, to_fold4
from coarse_fine_networks_tpu.ops.pallas.dw_fold import (
    dw_fold4,
    dw_fold4_stride2,
    fold_dw_conv3d,
)

C = 54


def _dwref(x, k, s=(1, 1, 1)):
    return lax.conv_general_dilated(
        x, k, s, [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1],
        precision=lax.Precision.HIGHEST)


@pytest.mark.parametrize("shape", [(2, 4, 16, 12), (1, 8, 28, 20),
                                   (2, 6, 8, 8), (1, 4, 16, 56)])
def test_dw_fold4_fwd_matches_conv(shape):
    rng = np.random.RandomState(0)
    b, t, h, w = shape
    x = jnp.asarray(rng.randn(b, t, h, w, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 1, C), jnp.float32)
    ref = _dwref(x, k)
    got = from_fold4(dw_fold4(to_fold4(x), k, C, True), C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_dw_fold4_stride2_matches_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 16, 12, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 1, C), jnp.float32)
    ref = _dwref(x, k, (1, 2, 2))
    got = from_fold4(dw_fold4_stride2(to_fold4(x), k, C, True), C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_dw_fold4_grads_match_conv(stride):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 8, 8, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 1, C), jnp.float32)
    g_seed = jnp.asarray(rng.randn(27), jnp.float32)  # stable loss weights

    def loss_pallas(x, k):
        y = fold_dw_conv3d(to_fold4(x), k, C, stride=stride, impl="interpret")
        return jnp.sum(from_fold4(y, C) ** 2)

    def loss_ref(x, k):
        return jnp.sum(_dwref(x, k, (1, stride, stride)) ** 2)

    gx_p, gk_p = jax.grad(loss_pallas, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r), rtol=1e-4,
                               atol=2e-4)


def test_dw_fold4_bf16():
    """bf16 path (lane rolls via u32 bitcast) stays close to the f32 oracle."""
    rng = np.random.RandomState(3)
    x32 = rng.randn(1, 4, 8, 12, C).astype(np.float32)
    k32 = rng.randn(3, 3, 3, 1, C).astype(np.float32)
    ref = np.asarray(_dwref(jnp.asarray(x32), jnp.asarray(k32)))
    got = from_fold4(
        dw_fold4(to_fold4(jnp.asarray(x32, jnp.bfloat16)),
                 jnp.asarray(k32), C, True), C).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=0.1, atol=0.15)


def test_sandwich_matches_interpret():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 4, 8, 8, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 1, C), jnp.float32)
    xf = to_fold4(x)
    a = fold_dw_conv3d(xf, k, C, stride=1, impl="sandwich")
    b = fold_dw_conv3d(xf, k, C, stride=1, impl="interpret")
    np.testing.assert_allclose(np.asarray(from_fold4(a, C)),
                               np.asarray(from_fold4(b, C)),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride", [1, 2])
def test_dw_fold4_act_fused_matches_unfused(stride):
    """Fused bn-apply+relu+conv (fwd and custom VJP) == relu(x*sc+bi) →
    conv, including grads w.r.t. x, k, sc and bi."""
    from coarse_fine_networks_tpu.ops.pallas.dw_fold import (
        fold_dw_bnrelu_conv3d,
    )

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 4, 16, 16, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 1, C), jnp.float32)
    from coarse_fine_networks_tpu.ops.fold import fold_pad, pad_vec

    p = fold_pad(C)
    sc = pad_vec(jnp.asarray(rng.rand(C) + 0.5, jnp.float32), C, p, 0.0)
    bi = pad_vec(jnp.asarray(rng.randn(C), jnp.float32), C, p, 0.0)

    def loss_fused(x, k, sc, bi):
        y = fold_dw_bnrelu_conv3d(to_fold4(x), k, sc, bi, C, stride=stride,
                                  impl="interpret")
        return jnp.sum(from_fold4(y, C) ** 2)

    def loss_ref(x, k, sc, bi):
        a = jnp.maximum(to_fold4(x) * sc + bi, 0.0)
        return jnp.sum(_dwref(from_fold4(a, C), k, (1, stride, stride)) ** 2)

    args = (x, k, sc, bi)
    np.testing.assert_allclose(float(loss_fused(*args)),
                               float(loss_ref(*args)), rtol=1e-5)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(gf, gr, ("dx", "dk", "dsc", "dbi")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4, err_msg=name)


@pytest.mark.parametrize("stride", [1, 2])
def test_dw_fold4_mm_act_fused_matches_unfused(stride):
    """Fused matmul+bn-apply+relu+conv (fwd and custom VJP) == x@wmm →
    relu(·*sc+bi) → conv, incl. grads w.r.t. x, wmm, k, sc and bi — the
    bottleneck's conv1 expansion (x3d_fine.py:85-97) run in-kernel."""
    from coarse_fine_networks_tpu.ops.fold import (
        fold_pad, fold_pointwise_kernel, pad_vec)
    from coarse_fine_networks_tpu.ops.pallas.dw_fold import (
        fold_dw_mm_bnrelu_conv3d,
    )

    rng = np.random.RandomState(11)
    c_in, c_mid = 24, C
    x = jnp.asarray(rng.randn(1, 4, 16, 16, c_in), jnp.float32)
    w1 = jnp.asarray(rng.randn(1, 1, 1, c_in, c_mid) / 5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 1, c_mid), jnp.float32)
    p = fold_pad(c_mid)
    sc = pad_vec(jnp.asarray(rng.rand(c_mid) + 0.5, jnp.float32), c_mid, p,
                 0.0)
    bi = pad_vec(jnp.asarray(rng.randn(c_mid), jnp.float32), c_mid, p, 0.0)

    def loss_fused(x, w1, k, sc, bi):
        wmm = fold_pointwise_kernel(w1, c_in, c_mid)
        y = fold_dw_mm_bnrelu_conv3d(to_fold4(x), wmm, k, sc, bi, c_mid,
                                     stride=stride, impl="interpret")
        return jnp.sum(from_fold4(y, c_mid) ** 2)

    def loss_ref(x, w1, k, sc, bi):
        z = jnp.einsum("bthwi,io->bthwo", x, w1.reshape(c_in, c_mid))
        a = jnp.maximum(to_fold4(z) * sc + bi, 0.0)
        return jnp.sum(
            _dwref(from_fold4(a, c_mid), k, (1, stride, stride)) ** 2)

    args = (x, w1, k, sc, bi)
    np.testing.assert_allclose(float(loss_fused(*args)),
                               float(loss_ref(*args)), rtol=1e-5)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(gf, gr, ("dx", "dw1", "dk", "dsc", "dbi")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4, err_msg=name)


@pytest.mark.parametrize("stride", [1, 2])
def test_act_dx_kernel_under_mesh(stride):
    """The act path's backward now runs through a tuple-output kernel
    (masked dx + per-batch (dsc, dbi) partials); both outputs must
    batch-shard under the data-parallel mesh and match the single-device
    gradients."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from coarse_fine_networks_tpu.ops.fold import fold_pad, pad_vec
    from coarse_fine_networks_tpu.ops.pallas.dw_fold import (
        fold_dw_bnrelu_conv3d,
    )

    if jax.device_count() < 2:
        pytest.skip("needs the 8-device CPU mesh")
    rng = np.random.RandomState(19)
    p = fold_pad(C)
    x = jnp.asarray(rng.randn(8, 2, 4, 16, 4 * p), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 1, C), jnp.float32)
    sc = pad_vec(jnp.asarray(rng.rand(C) + 0.5, jnp.float32), C, p, 0.0)
    bi = pad_vec(jnp.asarray(rng.randn(C), jnp.float32), C, p, 0.0)

    def loss(x, k, sc, bi):
        y = fold_dw_bnrelu_conv3d(x, k, sc, bi, C, stride=stride,
                                  impl="interpret")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    ref = grad(x, k, sc, bi)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(-1), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, PartitionSpec("data")))
    got = grad(xs, k, sc, bi)
    for a, b, name in zip(got, ref, ("dx", "dk", "dsc", "dbi")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4, err_msg=name)


@pytest.mark.parametrize("stride", [1, 2])
def test_dw_fold4_mm_bn_train_matches_reference(stride):
    """TRAIN-mode fused bottleneck entry (matmul + batch-stats + BN + relu +
    conv in one closed-form-VJP composite) == the plain-layout reference
    math under autodiff: forward, the (mean, var) batch statistics, and
    grads w.r.t. x, w1, k, gamma and beta."""
    from coarse_fine_networks_tpu.ops.fold import fold_pointwise_kernel
    from coarse_fine_networks_tpu.ops.pallas.dw_fold import (
        dw_fold4_mm_bn_train,
    )

    rng = np.random.RandomState(13)
    c_in, c_mid, eps = 24, C, 1e-5
    x = jnp.asarray(rng.randn(2, 3, 16, 16, c_in), jnp.float32)
    w1 = jnp.asarray(rng.randn(1, 1, 1, c_in, c_mid) / 5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 1, c_mid), jnp.float32)
    gamma = jnp.asarray(rng.rand(c_mid) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(c_mid) / 3, jnp.float32)

    def fused(x, w1, k, gamma, beta):
        wmm = fold_pointwise_kernel(w1, c_in, c_mid)
        y, mean, var = dw_fold4_mm_bn_train(to_fold4(x), wmm, k, gamma,
                                            beta, c_mid, stride, eps, True)
        return jnp.sum(from_fold4(y, c_mid) ** 2), (mean, var)

    def ref(x, w1, k, gamma, beta):
        z = jnp.einsum("bthwi,io->bthwo", x, w1.reshape(c_in, c_mid))
        mean = z.mean(axis=(0, 1, 2, 3))
        var = jnp.square(z).mean(axis=(0, 1, 2, 3)) - jnp.square(mean)
        a = jnp.maximum((z - mean) * jax.lax.rsqrt(var + eps) * gamma
                        + beta, 0.0)
        return jnp.sum(_dwref(a, k, (1, stride, stride)) ** 2), (mean, var)

    args = (x, w1, k, gamma, beta)
    (lf, (mf, vf)) = fused(*args)
    (lr, (mr, vr)) = ref(*args)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mr), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vr), rtol=1e-4,
                               atol=1e-5)
    gf = jax.grad(lambda *a: fused(*a)[0], argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(lambda *a: ref(*a)[0], argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(gf, gr, ("dx", "dw1", "dk", "dgamma", "dbeta")):
        b = np.asarray(b)
        # atol scaled to the gradient's magnitude: BN's mean-subtraction
        # makes dw1 a near-cancelling sum of three large terms, so f32
        # associativity differences show up as small absolute noise there
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-3,
                                   atol=1e-4 * max(np.abs(b).max(), 1.0),
                                   err_msg=name)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled bf16 kernels need real TPU "
                           "(CFN_TEST_TPU=1)")
def test_compiled_bf16_stride2_matches_interpret_on_tpu():
    """The compiled bf16 stride-2 kernels rely on the u32 sublane-pair
    bitcast convention (_interleave_w/_deinterleave_w: even sublane = low 16
    bits); CI runs only the interpret-mode reshape variants, so a packing
    mismatch on real hardware would flip even/odd columns and ship
    undetected — this on-chip check compares compiled fwd/bwd against
    interpret at a compiled-dispatch-eligible shape (the dx kernel's g
    halo tile needs (w/2 + 16) 8-aligned — exactly the
    ``fold_s2_supported`` contract; W=56 is NOT eligible and was a
    Mosaic compile error here, caught on-chip)."""
    from coarse_fine_networks_tpu.ops.pallas.dw_fold import fold_s2_supported

    rng = np.random.RandomState(0)
    c = 24
    b, t, h, w = 2, 8, 56, 64
    assert fold_s2_supported((b, t, h // 4, w, 128))
    assert not fold_s2_supported((b, t, h // 4, 56, 128))  # the old shape
    x = jnp.asarray(rng.randn(b, t, h, w, c), jnp.bfloat16)
    k = jnp.asarray(0.2 * rng.randn(3, 3, 3, 1, c), jnp.float32)
    xf = to_fold4(x)

    def loss(xf, k, interpret):
        y = dw_fold4_stride2(xf, k, c, interpret)
        return jnp.sum(y.astype(jnp.float32) ** 2), y

    (_, y_i), (gx_i, gk_i) = jax.value_and_grad(
        lambda a, b2: loss(a, b2, True), argnums=(0, 1), has_aux=True)(xf, k)
    (_, y_c), (gx_c, gk_c) = jax.jit(jax.value_and_grad(
        lambda a, b2: loss(a, b2, False), argnums=(0, 1), has_aux=True))(xf, k)

    np.testing.assert_allclose(
        np.asarray(y_c, np.float32), np.asarray(y_i, np.float32),
        rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(gx_c, np.float32), np.asarray(gx_i, np.float32),
        rtol=5e-2, atol=5e-1)
    np.testing.assert_allclose(np.asarray(gk_c), np.asarray(gk_i),
                               rtol=2e-2, atol=2e-1)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled bf16 kernels need real TPU "
                           "(CFN_TEST_TPU=1)")
@pytest.mark.parametrize("stride", [1, 2])
def test_compiled_act_dx_kernel_matches_interpret_on_tpu(stride):
    """The act-path dx kernels (in-kernel relu mask + dsc/dbi reductions,
    now the default backward) also use the u32 sublane-pair bitcasts on
    the stride-2 path; compare compiled bf16 against interpret at a real
    trunk shape so a packing or reduction-accumulation bug cannot ship
    undetected."""
    from coarse_fine_networks_tpu.ops.fold import fold_pad, pad_vec
    from coarse_fine_networks_tpu.ops.pallas.dw_fold import (
        fold_dw_bnrelu_conv3d,
    )

    rng = np.random.RandomState(5)
    c = 54
    p = fold_pad(c)
    b, t, h, w = 2, 8, 56, 64  # compiled s2 dispatch needs w/2+16 8-aligned
    x = jnp.asarray(rng.randn(b, t, h, w, c), jnp.bfloat16)
    k = jnp.asarray(0.2 * rng.randn(3, 3, 3, 1, c), jnp.float32)
    sc = pad_vec(jnp.asarray(rng.rand(c) + 0.5, jnp.float32), c, p, 0.0)
    bi = pad_vec(jnp.asarray(rng.randn(c) / 3, jnp.float32), c, p, 0.0)
    xf = to_fold4(x)

    def loss(xf, k, sc, bi, interpret):
        y = fold_dw_bnrelu_conv3d(
            xf, k, sc, bi, c, stride=stride,
            impl="interpret" if interpret else "pallas")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_i = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(
        xf, k, sc, bi)
    g_c = jax.jit(jax.grad(lambda *a: loss(*a, False),
                           argnums=(0, 1, 2, 3)))(xf, k, sc, bi)
    for a, b2, name in zip(g_c, g_i, ("dx", "dk", "dsc", "dbi")):
        a, b2 = np.asarray(a, np.float32), np.asarray(b2, np.float32)
        np.testing.assert_allclose(
            a, b2, rtol=5e-2, atol=5e-2 * max(np.abs(b2).max(), 1.0),
            err_msg=name)
