"""Depthwise-conv implementations: shift-and-add and the Pallas stencil
(interpret mode) against lax.conv, including strides, tiling and the custom
VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import coarse_fine_networks_tpu.ops.pallas.dw_conv as dwc


@pytest.mark.parametrize("ks,st", [
    ((5, 1, 1), (1, 1, 1)),
    ((3, 3, 3), (1, 1, 1)),
    ((3, 3, 3), (1, 2, 2)),
    ((3, 3, 3), (2, 2, 2)),
])
def test_shift_add_matches_lax(ks, st):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 8, 12, 6), jnp.float32)
    w = jnp.asarray(rng.rand(*ks, 1, 6), jnp.float32)
    ref = dwc.depthwise_conv3d(x, w, st, impl="lax")
    got = dwc.depthwise_conv3d(x, w, st, impl="shift_add")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("ks", [(5, 1, 1), (3, 3, 3), (3, 1, 1)])
def test_pallas_interpret_matches_lax(ks):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 8, 8, 12, 6), jnp.float32)
    w = jnp.asarray(rng.rand(*ks, 1, 6), jnp.float32)
    ref = dwc.depthwise_conv3d(x, w, impl="lax")
    got = dwc._dw_pallas(x, w, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_pallas_tiled_matches_lax(monkeypatch):
    monkeypatch.setattr(dwc, "_pick_tiles", lambda *a: (4, 4))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 12, 8, 12, 6), jnp.float32)
    for ks in [(5, 1, 1), (3, 3, 3)]:
        w = jnp.asarray(rng.rand(*ks, 1, 6), jnp.float32)
        ref = dwc.depthwise_conv3d(x, w, impl="lax")
        got = dwc._dw_pallas(x, w, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5, err_msg=str(ks))


@pytest.mark.parametrize("ks", [(5, 1, 1), (3, 3, 3)])
def test_pallas_vjp_matches_lax_autodiff(ks):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 6, 8, 12, 6), jnp.float32)
    w = jnp.asarray(rng.rand(*ks, 1, 6), jnp.float32)
    g = jnp.asarray(rng.rand(2, 6, 8, 12, 6), jnp.float32)

    gp = jax.grad(lambda a, b: jnp.sum(dwc._dw_pallas(a, b, True) * g),
                  argnums=(0, 1))(x, w)
    gl = jax.grad(
        lambda a, b: jnp.sum(dwc.depthwise_conv3d(a, b, impl="lax") * g),
        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gl[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gl[1]),
                               rtol=1e-3, atol=1e-3)


def test_shift_add_gradients_match_lax():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 6, 8, 12, 6), jnp.float32)
    w = jnp.asarray(rng.rand(3, 3, 3, 1, 6), jnp.float32)
    for st in [(1, 1, 1), (1, 2, 2)]:
        gs = jax.grad(
            lambda a, b: jnp.sum(
                dwc.depthwise_conv3d(a, b, st, impl="shift_add") ** 2),
            argnums=(0, 1))(x, w)
        gl = jax.grad(
            lambda a, b: jnp.sum(
                dwc.depthwise_conv3d(a, b, st, impl="lax") ** 2),
            argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gl[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gl[1]),
                                   rtol=1e-3, atol=1e-3)
