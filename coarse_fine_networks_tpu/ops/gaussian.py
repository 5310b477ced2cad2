"""Gaussian temporal alignment between fine-stream frames and coarse locations.

Re-implements the semantics of ``Gaussian.forward`` (``x3d_coarse.py:251-286``)
as a pure function: build an alignment matrix ``f ∈ (B', T_fine, T_coarse)``
where each coarse temporal location (a grid-pool knot, or a uniform index) gets
a max-normalised Gaussian bump over the fine-stream time axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_alignment(
    meta: jax.Array,
    feat_mask: jax.Array,
    knots: jax.Array | None,
    t_in: int,
    coarse_len: int | None = None,
    ratio: float = 1.0,
    crops: int = 1,
) -> jax.Array:
    """Alignment matrix between fine feature frames and coarse locations.

    Args:
      meta: ``(B, 4)`` int/float ``[start_f, frames, nf, stride] // gamma_tau``
        (``charades_coarse_fineFEAT.py:199-200``).
      feat_mask: ``(B, T_fine)`` binary validity mask over cached fine frames.
      knots: ``(B', K)`` grid-pool CDF knots in ``[0, 1]`` (``B' = B*crops``),
        or ``None`` for uniform coarse locations (non-grid ``t_pool`` modes,
        ``x3d_coarse.py:268-274``).
      t_in: input clip temporal length (scales knots to frame units,
        ``x3d_coarse.py:270``).
      coarse_len: number of coarse locations when ``knots is None``.
      ratio: divisor on the coarse frame location (``x3d_coarse.py:275``;
        the reference instantiates ``Gaussian(ratio=1)``, ``x3d_coarse.py:547``).
      crops: multi-crop testing factor; crop ``i`` offsets the start frame by
        ``i * stride`` (``x3d_coarse.py:264-266``).

    Returns:
      ``(B', T_fine, K)`` max-normalised alignment weights.
    """
    meta = meta.astype(jnp.float32)
    st = meta[:, 0]
    step = meta[:, 3]
    b = meta.shape[0]
    len_f = feat_mask.shape[1]

    if crops > 1:
        offset = step[:, None] * jnp.arange(crops, dtype=jnp.float32)[None, :]
        st = (st[:, None] + offset).reshape(-1)  # (B*crops,) crop-major per sample
    b2 = b * crops

    if knots is not None:
        tl = knots * float(t_in)  # (B', K)
    else:
        assert coarse_len is not None
        tl = jnp.broadcast_to(
            jnp.arange(coarse_len, dtype=jnp.float32)[None, :], (b2, coarse_len)
        )
    mu = (tl + st[:, None]) / ratio  # (B', K)

    t = jnp.arange(len_f, dtype=jnp.float32)  # fine-frame independent variable
    # std = 1/8 of the number of valid fine frames (x3d_coarse.py:278),
    # repeated per crop.
    std = (1.0 / 8.0) * jnp.sum(feat_mask.astype(jnp.float32), axis=1)  # (B,)
    std = jnp.repeat(std, crops)  # (B',)

    d = t[None, :, None] - mu[:, None, :]  # (B', T_fine, K)
    f = jnp.exp(-(d**2) / (2.0 * (std**2)[:, None, None] + 1e-16))
    f = f / (jnp.max(f, axis=1, keepdims=True) + 1e-16)
    return f
