"""Adaptive spatial pooling helpers.

The reference leans on ``adaptive_{avg,max}_pool`` between the exact-multiple
spatial resolutions 56/28/14/7 (``x3d_fine.py:345-360``,
``x3d_coarse.py:205-214, 312-325``).  For integer-divisible sizes PyTorch's
adaptive pooling degenerates to fixed-window pooling (downscale) or
nearest-neighbour replication (upscale); we implement exactly those cases —
which are the only ones the model graph ever exercises — as reshapes and
reductions, which XLA fuses for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _check_divisible(size: int, out: int) -> int:
    if size % out != 0:
        raise ValueError(f"adaptive pool {size}->{out} is not integer-divisible")
    return size // out


def adaptive_avg_pool_spatial(x: jax.Array, out_hw: int) -> jax.Array:
    """Average-pool the H, W axes of ``(B, T, H, W, C)`` to ``out_hw``.

    Matches ``F.adaptive_avg_pool3d(x, (None, out, out))`` for divisible sizes
    (the global-tower taps, ``x3d_fine.py:345-360``).
    """
    b, t, h, w, c = x.shape
    fh = _check_divisible(h, out_hw)
    fw = _check_divisible(w, out_hw)
    x = x.reshape(b, t, out_hw, fh, out_hw, fw, c)
    return jnp.mean(x, axis=(3, 5))


def adaptive_max_pool_spatial(x: jax.Array, out_hw: int) -> jax.Array:
    """Max-pool (divisible downscale) or replicate (divisible upscale) H, W.

    Matches ``F.adaptive_max_pool2d`` at the resolutions the reference uses
    (``x3d_coarse.py:213-214, 312-325``): for divisible upscales PyTorch's
    adaptive max pooling selects ``input[i * in / out]`` which is exactly
    nearest-neighbour replication.
    """
    h = x.shape[2]
    if h == out_hw:
        return x
    if out_hw > h:
        return spatial_replicate(x, out_hw)
    b, t, _, w, c = x.shape
    fh = _check_divisible(h, out_hw)
    fw = _check_divisible(w, out_hw)
    x = x.reshape(b, t, out_hw, fh, out_hw, fw, c)
    return jnp.max(x, axis=(3, 5))


def spatial_replicate(x: jax.Array, out_hw: int) -> jax.Array:
    """Nearest-neighbour upscale of H, W by an integer factor."""
    b, t, h, w, c = x.shape
    f = _check_divisible(out_hw, h) if out_hw % h == 0 else None
    if f is None:
        raise ValueError(f"replicate {h}->{out_hw} is not an integer factor")
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :], (b, t, h, f, w, f, c))
    return x.reshape(b, t, out_hw, out_hw, c)
