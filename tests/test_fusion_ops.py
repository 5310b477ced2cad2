"""Parity tests for Gaussian alignment, reweight aggregation and adaptive pools
against straightforward torch/numpy oracles of the reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from coarse_fine_networks_tpu.ops import (
    gaussian_alignment,
    reweight_aggregate,
    adaptive_avg_pool_spatial,
    adaptive_max_pool_spatial,
    spatial_replicate,
)


def _torch_gaussian(meta, mask, gx, tx, ratio=1.0, crops=1):
    """Oracle for Gaussian.forward (x3d_coarse.py:256-286), CPU."""
    st, step = meta[:, 0].float(), meta[:, 3].float()
    b = meta.shape[0]
    b2 = b * crops
    len_f = mask.shape[1]
    if crops > 1:
        offset = step.view(-1, 1) * torch.arange(0, crops).float().view(1, -1)
        st = (st.view(-1, 1) + offset).view(-1)
    tl = (gx * tx).unsqueeze(1)  # (B', 1, K)
    mu = (tl + st.view(b2, 1, 1)) / ratio
    len_x = gx.shape[1]
    t = torch.arange(0, len_f).float().view(1, -1, 1).repeat(b2, 1, 1)
    std = (1 / 8 * torch.sum(mask, dim=1)).view(-1, 1).repeat(1, crops).view(-1, 1)
    t = t - mu
    f = t**2 / (2 * (std**2).view(b2, 1, 1).repeat(1, len_f, len_x) + 1e-16)
    f = torch.exp(-f)
    f = f / (torch.max(f, dim=1)[0].view(b2, 1, len_x) + 1e-16)
    return f.view(b2, len_f, len_x)


@pytest.mark.parametrize("crops", [1, 2])
def test_gaussian_alignment_matches_reference_math(crops):
    rng = np.random.RandomState(0)
    b, tf, k, t_in = 3, 24, 9, 32
    meta = np.stack(
        [
            rng.randint(0, 5, b),
            np.full(b, t_in),
            rng.randint(t_in, t_in * 3, b),
            np.full(b, 1),
        ],
        axis=1,
    ).astype(np.int64)
    mask = (rng.rand(b, tf) > 0.2).astype(np.float32)
    mask[:, 0] = 1.0
    knots = np.sort(rng.rand(b * crops, k).astype(np.float32), axis=1)

    ref = _torch_gaussian(
        torch.from_numpy(meta), torch.from_numpy(mask), torch.from_numpy(knots),
        t_in, crops=crops,
    ).numpy()
    got = np.asarray(
        gaussian_alignment(
            jnp.asarray(meta), jnp.asarray(mask), jnp.asarray(knots), t_in,
            crops=crops,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_reweight_aggregate_matches_6d_broadcast():
    """The einsum formulation equals the reference's 6-D broadcast
    (x3d_coarse.py:221-225) computed here as a torch oracle."""
    rng = np.random.RandomState(1)
    b, tf, tc, h, c = 2, 12, 5, 7, 6
    feat = rng.randn(b, c, tf, h, h).astype(np.float32)
    gate = (1 / (1 + np.exp(-rng.randn(b, 1, tf, h, h)))).astype(np.float32)
    gx = rng.rand(b, tf, tc).astype(np.float32)
    mask = (rng.rand(b, tf) > 0.3).astype(np.float32)
    mask[:, 0] = 1

    xt = torch.from_numpy(feat)
    at = torch.from_numpy(gate).unsqueeze(3) * torch.from_numpy(gx).view(
        b, 1, tf, tc, 1, 1
    )
    xw = xt.unsqueeze(3) * at  # (B, C, Tf, Tc, H, W)
    m = torch.from_numpy(mask).view(b, 1, tf, 1, 1, 1)
    temp_w = m / (torch.sum(at * m, dim=2, keepdim=True) + 1e-6)
    ref = torch.sum(xw * temp_w, dim=2).numpy()  # (B, C, Tc, H, W)

    got = reweight_aggregate(
        jnp.asarray(feat).transpose(0, 2, 3, 4, 1),
        jnp.asarray(gate[:, 0]),
        jnp.asarray(gx),
        jnp.asarray(mask),
    )
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("h_in,h_out", [(56, 7), (28, 7), (14, 14), (56, 28)])
def test_adaptive_avg_pool_matches_torch(h_in, h_out):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, h_in, h_in, 4).astype(np.float32)
    ref = F.adaptive_avg_pool3d(
        torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), (None, h_out, h_out)
    ).numpy()
    got = np.asarray(adaptive_avg_pool_spatial(jnp.asarray(x), h_out))
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("h_in,h_out", [(56, 7), (7, 56), (28, 56), (14, 7)])
def test_adaptive_max_pool_matches_torch(h_in, h_out):
    rng = np.random.RandomState(0)
    b, t, c = 2, 3, 4
    x = rng.randn(b, t, h_in, h_in, c).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3)).reshape(b, c * t, h_in, h_in)
    ref = F.adaptive_max_pool2d(xt, (h_out, h_out)).reshape(b, c, t, h_out, h_out)
    got = np.asarray(adaptive_max_pool_spatial(jnp.asarray(x), h_out))
    np.testing.assert_allclose(
        got.transpose(0, 4, 1, 2, 3), ref.numpy(), rtol=1e-5, atol=1e-6
    )


def test_replicated_fusion_maps_are_exact():
    """Computing fusion at canonical 7×7 then replicating reproduces the
    reference's upsample(7→56) → conv1x1 → pool-back pipeline, because every
    op in that pipeline is pointwise or replication-compatible."""
    rng = np.random.RandomState(2)
    x7 = rng.randn(1, 2, 7, 7, 3).astype(np.float32)
    x56 = np.asarray(spatial_replicate(jnp.asarray(x7), 56))
    # pool back down recovers the original
    back = np.asarray(adaptive_max_pool_spatial(jnp.asarray(x56), 7))
    np.testing.assert_allclose(back, x7, atol=1e-6)
    # and matches torch's adaptive_max_pool2d upsample
    xt = torch.from_numpy(x7.transpose(0, 4, 1, 2, 3)).reshape(1, 6, 7, 7)
    ref = F.adaptive_max_pool2d(xt, (56, 56)).reshape(1, 3, 2, 56, 56).numpy()
    np.testing.assert_allclose(x56.transpose(0, 4, 1, 2, 3), ref, atol=1e-6)
