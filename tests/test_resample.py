"""Parity tests for the hat-matrix temporal resampling ops.

Oracles are PyTorch *built-ins* (grid_sample / interpolate / searchsorted) —
the same primitives the reference composes — evaluated on CPU.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.ops import (
    temporal_resample,
    linear_resize,
    inverse_cdf,
    cdf_knots,
)


def _torch_temporal_grid_sample(x_bcthw, knots01):
    """Reference-style 5-D grid_sample with identity H/W grids
    (x3d_coarse.py:394-403)."""
    b, c, t, h, w = x_bcthw.shape
    gx = (knots01 - 0.5) * 2  # (B, K)
    gh = (torch.arange(h, dtype=torch.float32) / max(h - 1, 1) - 0.5) * 2
    gw = (torch.arange(w, dtype=torch.float32) / max(w - 1, 1) - 0.5) * 2
    grid = torch.meshgrid([gx.reshape(-1), gh, gw], indexing="ij")
    grid = torch.stack((grid[2], grid[1], grid[0]), dim=-1).view(
        b, gx.shape[1], h, w, 3
    )
    return F.grid_sample(x_bcthw, grid, align_corners=True)


@pytest.mark.parametrize("seed", [0, 1])
def test_temporal_resample_matches_grid_sample(seed):
    rng = np.random.RandomState(seed)
    b, c, t, h, w = 2, 5, 16, 4, 4
    x = rng.randn(b, c, t, h, w).astype(np.float32)
    scores = rng.randn(b, t // 4).astype(np.float32)
    knots = np.asarray(cdf_knots(jnp.asarray(scores)))

    ref = _torch_temporal_grid_sample(torch.from_numpy(x), torch.from_numpy(knots))
    ref = ref.numpy()  # (B, C, K, H, W)

    x_tpu = jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))  # B T H W C
    pos = jnp.asarray(knots) * (t - 1)
    got = temporal_resample(x_tpu, pos)  # B K H W C
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_temporal_resample_out_of_range_zero_pads():
    x = jnp.ones((1, 4, 1, 1, 1))
    pos = jnp.asarray([[-2.0, -0.5, 1.0, 3.5, 5.0]])
    out = np.asarray(temporal_resample(x, pos))[0, :, 0, 0, 0]
    np.testing.assert_allclose(out, [0.0, 0.5, 1.0, 0.5, 0.0], atol=1e-6)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("out_len", [7, 25, 64, 100])
def test_linear_resize_matches_interpolate(align_corners, out_len):
    rng = np.random.RandomState(0)
    b, c, t = 3, 6, 33
    x = rng.randn(b, c, t).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), out_len, mode="linear", align_corners=align_corners
    ).numpy()
    got = linear_resize(jnp.asarray(x).transpose(0, 2, 1), out_len, align_corners)
    got = np.asarray(got).transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def _torch_interp1d(x, y, xnew):
    """The reference's Interp1d forward math (interp1d.py:100-141)."""
    eps = torch.finfo(y.dtype).eps
    ind = torch.searchsorted(x.contiguous(), xnew.contiguous())
    ind = torch.clamp(ind - 1, 0, x.shape[1] - 2)
    slopes = (y[:, 1:] - y[:, :-1]) / (eps + (x[:, 1:] - x[:, :-1]))
    return torch.gather(y, 1, ind) + torch.gather(slopes, 1, ind) * (
        xnew - torch.gather(x, 1, ind)
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_inverse_cdf_matches_interp1d(seed):
    rng = np.random.RandomState(seed)
    b, t4 = 4, 16
    scores = rng.randn(b, t4).astype(np.float32) * 2
    knots = np.asarray(cdf_knots(jnp.asarray(scores)))  # (B, 17)
    k = knots.shape[1]
    mid = np.tile((np.arange(k) / (k - 1)).astype(np.float32), (b, 1))

    ref = _torch_interp1d(
        torch.from_numpy(knots), torch.from_numpy(mid), torch.from_numpy(mid)
    ).numpy()
    got = np.asarray(inverse_cdf(jnp.asarray(knots)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_inverse_cdf_gradients_flow():
    scores = jnp.asarray(np.random.RandomState(0).randn(2, 8), jnp.float32)

    def f(s):
        return jnp.sum(inverse_cdf(cdf_knots(s)) ** 2)

    g = jax.grad(f)(scores)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_grid_pool_roundtrip_identity_for_uniform_scores():
    """Uniform confidence ⇒ uniform CDF ⇒ resample-then-unpool ≈ identity."""
    t = 32
    scores = jnp.zeros((1, t // 4))
    knots = cdf_knots(scores)  # uniform knots 0..1
    k = knots.shape[1]
    np.testing.assert_allclose(
        np.asarray(knots)[0], np.arange(k) / (k - 1), atol=1e-6
    )
    inv = inverse_cdf(knots)
    np.testing.assert_allclose(np.asarray(inv)[0], np.arange(k) / (k - 1), atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_general_interp1d_matches_reference_math(seed):
    from coarse_fine_networks_tpu.ops import interp1d

    rng = np.random.RandomState(seed)
    b, n, p = 3, 12, 7
    x = np.sort(rng.rand(b, n).astype(np.float32) * 4, axis=1)
    y = rng.randn(b, n).astype(np.float32)
    q = (rng.rand(b, p).astype(np.float32) * 5) - 0.5  # incl. extrapolation

    ref = _torch_interp1d(torch.from_numpy(x), torch.from_numpy(y),
                          torch.from_numpy(q)).numpy()
    got = np.asarray(interp1d(jnp.asarray(x), jnp.asarray(y), jnp.asarray(q)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
