"""SubBatchNorm parity: train-mode normalisation, running-stat updates, and
eval-time aggregation, against torch.nn.BatchNorm3d oracles."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.models.layers import (
    SubBatchNorm,
    aggregate_sub_bn_stats,
)


def _run_ours(x_np, num_splits, steps=1):
    m = SubBatchNorm(features=x_np.shape[-1], num_splits=num_splits)
    variables = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x_np), True)
    outs = []
    for _ in range(steps):
        out, upd = m.apply(variables, jnp.asarray(x_np), True,
                           mutable=["batch_stats"])
        variables = {"params": variables["params"], **upd}
        outs.append(np.asarray(out))
    return outs, variables


def test_train_mode_matches_batchnorm3d_splits1():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 3, 5, 5, 6).astype(np.float32)  # (B, T, H, W, C)
    outs, variables = _run_ours(x, num_splits=1, steps=2)

    bn = torch.nn.BatchNorm3d(6)
    bn.train()
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    for i in range(2):
        ref = bn(xt).detach().numpy()
        np.testing.assert_allclose(
            outs[i].transpose(0, 4, 1, 2, 3), ref, rtol=1e-4, atol=1e-5
        )
    stats = variables["batch_stats"]
    np.testing.assert_allclose(
        np.asarray(stats["split_mean"]), bn.running_mean.numpy(), rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(stats["split_var"]), bn.running_var.numpy(), rtol=1e-5,
        atol=1e-6,
    )


def test_split_bn_normalises_per_split():
    rng = np.random.RandomState(1)
    s = 2
    x = rng.randn(4, 2, 3, 3, 4).astype(np.float32)
    outs, _ = _run_ours(x, num_splits=s)
    out = outs[0]
    # Per-split normalisation: samples [g*s + i for g] share stats of split i
    # (the reference's channel-folding view, x3d_fine.py:51-56).
    xs = x.reshape(2, s, 2, 3, 3, 4)
    mean = xs.mean(axis=(0, 2, 3, 4), keepdims=True)
    var = xs.var(axis=(0, 2, 3, 4), keepdims=True)
    ref = ((xs - mean) / np.sqrt(var + 1e-5)).reshape(x.shape)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_aggregate_stats_matches_reference_formula():
    rng = np.random.RandomState(2)
    s, c = 4, 3
    stats = {
        "bnx": {
            "mean": np.zeros(c, np.float32),
            "var": np.ones(c, np.float32),
            "split_mean": rng.randn(s * c).astype(np.float32),
            "split_var": rng.rand(s * c).astype(np.float32) + 0.5,
        }
    }
    agg = aggregate_sub_bn_stats(stats)
    sm = stats["bnx"]["split_mean"].reshape(s, c)
    sv = stats["bnx"]["split_var"].reshape(s, c)
    mean = sm.sum(0) / s
    var = sv.sum(0) / s + ((sm - mean) ** 2).sum(0) / s
    np.testing.assert_allclose(np.asarray(agg["bnx"]["mean"]), mean, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(agg["bnx"]["var"]), var, rtol=1e-6)
    # untouched split stats preserved
    np.testing.assert_allclose(
        np.asarray(agg["bnx"]["split_mean"]), stats["bnx"]["split_mean"]
    )


def test_large_offset_variance_cancellation_stays_finite():
    """One-pass batch variance E[x^2]-E[x]^2 can round NEGATIVE in f32 when
    |mean| >> std (offset ~1e9, true var ~1); rsqrt(negative + eps) then
    NaN-poisons the whole step.  torch's batch_norm (two-pass/Welford) never
    produces a negative variance, so ours clamps at 0 — found live by the
    training-trajectory harness when drifting fusion bias maps pushed trunk
    activations to ~1e9 (tests/test_training_trajectory.py)."""
    rng = np.random.RandomState(0)
    x = (rng.randn(4, 6, 8, 8, 3) + 1.013e9).astype(np.float32)
    # precondition: the cancellation actually goes negative at this offset
    xj = jnp.asarray(x)
    fast_var = np.asarray(
        jnp.mean(jnp.square(xj), axis=(0, 1, 2, 3))
        - jnp.square(jnp.mean(xj, axis=(0, 1, 2, 3))))
    assert (fast_var < -1e5).any(), fast_var

    for splits in (1, 2):
        (out,), variables = _run_ours(x, num_splits=splits)
        assert np.isfinite(out).all(), f"splits={splits}"
        assert np.isfinite(
            np.asarray(variables["batch_stats"]["split_var"])).all()
        assert (np.asarray(variables["batch_stats"]["split_var"]) >= 0).all()


def test_folded_subbn_large_offset_stays_finite():
    """The fold4-layout BN twin shares the one-pass variance — same clamp
    (models/x3d_fold.py)."""
    from coarse_fine_networks_tpu.models.x3d_fold import FoldedSubBatchNorm
    from coarse_fine_networks_tpu.ops.fold import to_fold4

    rng = np.random.RandomState(0)
    c = 3
    x = (rng.randn(4, 6, 8, 8, c) + 1.013e9).astype(np.float32)
    xf = to_fold4(jnp.asarray(x))
    m = FoldedSubBatchNorm(c, 1)
    variables = m.init({"params": jax.random.PRNGKey(0)}, xf, True)
    out, upd = m.apply(variables, xf, True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(upd["batch_stats"]["split_var"]) >= 0).all()
