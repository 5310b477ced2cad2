"""Adaptive spatial pooling, matching ``F.adaptive_{avg,max}_pool`` exactly.

The reference leans on adaptive pools between the spatial resolutions
56/28/14/7 (``x3d_fine.py:345-360``, ``x3d_coarse.py:205-214, 312-325``).
PyTorch's window rule for output ``i`` over ``in_len`` inputs is
``[floor(i·in/out), ceil((i+1)·in/out))``; we implement exactly that, with a
fast reshape path for integer-divisible sizes (the only ones the published
model exercises) and a gather path for the general case.

A useful nesting property (used by the coarse model): because
``floor(floor(8a)/8) == floor(a)`` and the matching ceil identity, adaptively
max-pooling a ×k-replicated map to any size equals pooling the original map
directly — so fusion maps can be computed at canonical 7×7 and pooled straight
to each stage's resolution, reproducing the reference's
replicate(7→56) → pool(56→h) chain exactly.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _windows(in_len: int, out_len: int):
    """PyTorch adaptive-pool gather windows: (index, valid) of shape
    ``(out_len, wmax)``."""
    i = np.arange(out_len)
    starts = (i * in_len) // out_len
    ends = -(-((i + 1) * in_len) // out_len)
    wmax = int((ends - starts).max())
    idx = starts[:, None] + np.arange(wmax)[None, :]
    valid = idx < ends[:, None]
    idx = np.minimum(idx, in_len - 1)
    return idx, valid


def _adaptive_pool_axis(x: jax.Array, axis: int, out_len: int, op: str) -> jax.Array:
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    if in_len % out_len == 0:
        # fast reshape path (fixed windows)
        f = in_len // out_len
        shape = x.shape[:axis] + (out_len, f) + x.shape[axis + 1:]
        xr = x.reshape(shape)
        red = jnp.mean if op == "avg" else jnp.max
        return red(xr, axis=axis + 1)
    idx, valid = _windows(in_len, out_len)
    g = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=axis)
    shape = x.shape[:axis] + idx.shape + x.shape[axis + 1:]
    g = g.reshape(shape)
    vshape = (1,) * axis + idx.shape + (1,) * (x.ndim - axis - 1)
    v = jnp.asarray(valid).reshape(vshape)
    if op == "avg":
        s = jnp.sum(jnp.where(v, g, 0), axis=axis + 1)
        return s / jnp.sum(v, axis=axis + 1).astype(x.dtype)
    neg = jnp.asarray(-jnp.inf, dtype=x.dtype)
    return jnp.max(jnp.where(v, g, neg), axis=axis + 1)


def adaptive_avg_pool_spatial(x: jax.Array, out_hw: int) -> jax.Array:
    """``F.adaptive_avg_pool3d(x, (None, out, out))`` on ``(B, T, H, W, C)``
    (the global-tower taps, ``x3d_fine.py:345-360``)."""
    x = _adaptive_pool_axis(x, 2, out_hw, "avg")
    return _adaptive_pool_axis(x, 3, out_hw, "avg")


def adaptive_max_pool_spatial(x: jax.Array, out_hw: int) -> jax.Array:
    """``F.adaptive_max_pool2d`` applied to the H, W axes of ``(B, T, H, W, C)``
    (``x3d_coarse.py:213-214, 312-325``).  For divisible upscales this is
    nearest-neighbour replication, exactly like PyTorch."""
    x = _adaptive_pool_axis(x, 2, out_hw, "max")
    return _adaptive_pool_axis(x, 3, out_hw, "max")


def spatial_replicate(x: jax.Array, out_hw: int) -> jax.Array:
    """Nearest-neighbour upscale of H, W by an integer factor (the divisible
    special case of adaptive max-pool upsampling, kept as a cheap fast path)."""
    b, t, h, w, c = x.shape
    if out_hw % h != 0:
        return adaptive_max_pool_spatial(x, out_hw)
    f = out_hw // h
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :], (b, t, h, f, w, f, c))
    return x.reshape(b, t, out_hw, out_hw, c)
