"""Shared building-block layers for the X3D trunks.

The reference duplicates these between ``x3d_fine.py:13-175`` and
``x3d_coarse.py:11-172``; here there is a single implementation, channels-last
``(B, T, H, W, C)``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# Kaiming-normal fan_out/relu, matching the reference init
# (x3d_fine.py:260-264).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def round_width(width: int, multiplier: float = 0.0625, min_width: int = 8,
                divisor: int = 8) -> int:
    """SE squeeze-width rule (x3d_fine.py:132-143)."""
    if not multiplier:
        return int(width)
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


def swish(x: jax.Array) -> jax.Array:
    """x * sigmoid(x).  JAX differentiates this to exactly the hand-written
    backward of the reference's SwishEfficient (x3d_fine.py:74-86)."""
    return x * jax.nn.sigmoid(x)


Swish = swish  # alias mirroring the reference's module name


class SubBatchNorm(nn.Module):
    """SlowFast-style split batch norm (x3d_fine.py:13-62).

    During training each of ``num_splits`` sub-batches is normalised with its
    own statistics (the reference folds splits into channels,
    ``x3d_fine.py:51-56``); a single affine scale/bias is shared.  Separate
    running stats are kept per split; :func:`aggregate_stats` merges them into
    the eval-time stats (``aggregate_stats``, ``x3d_fine.py:39-49``) — call
    :func:`coarse_fine_networks_tpu.models.layers.aggregate_sub_bn_stats` on
    the ``batch_stats`` collection before evaluation.

    Note: under a jit-compiled data-parallel mesh the batch-stat reductions are
    *global* across devices (XLA inserts the cross-replica collectives), which
    strictly improves on the reference's per-GPU DataParallel statistics.
    """

    features: int
    num_splits: int = 1
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        s, c = self.num_splits, self.features
        dtype = jnp.float32

        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), dtype))
        sp_mean = self.variable("batch_stats", "split_mean",
                                lambda: jnp.zeros((s * c,), dtype))
        sp_var = self.variable("batch_stats", "split_var",
                               lambda: jnp.ones((s * c,), dtype))

        orig_dtype = x.dtype
        x = x.astype(dtype)
        reduce_axes = tuple(range(1, x.ndim - 1))  # all but batch & channel

        if train:
            n = x.shape[0]
            if n % s != 0:
                raise ValueError(f"batch {n} not divisible by num_splits {s}")
            xg = x.reshape((n // s, s) + x.shape[1:])
            g_axes = (0,) + tuple(a + 1 for a in reduce_axes)
            mean = jnp.mean(xg, axis=g_axes)          # (S, C)
            mean2 = jnp.mean(jnp.square(xg), axis=g_axes)
            # biased, used to normalise; clamped at 0 because the one-pass
            # E[x²]−E[x]² form can go negative by f32 cancellation when
            # |mean| ≫ std (torch's two-pass batch_norm never does, and
            # rsqrt(negative) would NaN-poison the whole step — seen live
            # in the trajectory harness when fusion bias maps drift large)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            shape = (1, s) + (1,) * len(reduce_axes) + (c,)
            xn = (xg - mean.reshape(shape)) * jax.lax.rsqrt(
                var.reshape(shape) + self.eps
            )
            xn = xn.reshape(x.shape)
            if not self.is_initializing():
                count = n // s
                for a in reduce_axes:
                    count *= x.shape[a]
                unbiased = var * (count / max(count - 1, 1))
                m = self.momentum
                sp_mean.value = (1 - m) * sp_mean.value + m * mean.reshape(-1)
                sp_var.value = (1 - m) * sp_var.value + m * unbiased.reshape(-1)
        else:
            shape = (1,) * (x.ndim - 1) + (c,)
            xn = (x - ra_mean.value.reshape(shape)) * jax.lax.rsqrt(
                ra_var.value.reshape(shape) + self.eps
            )

        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,), dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), dtype)
            xn = xn * scale + bias
        return xn.astype(orig_dtype)


def _is_subbn_stats(node: Any) -> bool:
    return (
        isinstance(node, dict)
        and {"mean", "var", "split_mean", "split_var"} <= set(node.keys())
    )


def aggregate_sub_bn_stats(batch_stats: dict) -> dict:
    """Merge per-split running stats into eval stats for every SubBatchNorm.

    Pure-pytree equivalent of ``aggregate_sub_bn_stats``
    (``x3d_fine.py:321-328`` / ``_get_aggregated_mean_std``,
    ``x3d_fine.py:31-37``): mean over splits, plus the between-split variance
    correction.  Returns a new ``batch_stats`` dict.
    """

    def rec(node):
        if _is_subbn_stats(node):
            c = node["mean"].shape[0]
            sm = node["split_mean"].reshape(-1, c)
            sv = node["split_var"].reshape(-1, c)
            n = sm.shape[0]
            mean = jnp.sum(sm, axis=0) / n
            var = jnp.sum(sv, axis=0) / n + jnp.sum(
                jnp.square(sm - mean[None, :]), axis=0
            ) / n
            out = dict(node)
            out["mean"] = mean
            out["var"] = var
            return out
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(batch_stats)


class SqueezeExcite(nn.Module):
    """SE block applied on even-indexed bottlenecks (x3d_fine.py:123-128,
    157-163).

    ``width`` overrides the squeeze width; the tensor-parallel padded tower
    (parallel/tensor.py) keeps the *original* ``round_width(mid)`` while
    ``planes`` is channel-padded, so the fc1/fc2 kernels stay
    checkpoint-compatible up to zero columns.
    """

    planes: int
    width: int | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        width = self.width if self.width is not None else round_width(
            self.planes)
        s = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        s = nn.Conv(width, (1, 1, 1), use_bias=True, name="fc1",
                    kernel_init=kaiming_normal, dtype=x.dtype)(s)
        s = nn.relu(s)
        s = nn.Conv(self.planes, (1, 1, 1), use_bias=True, name="fc2",
                    kernel_init=kaiming_normal, dtype=x.dtype)(s)
        return x * jax.nn.sigmoid(s)
