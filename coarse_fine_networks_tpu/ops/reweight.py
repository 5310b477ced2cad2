"""Fused softmax-free attention aggregation for multi-stage fusion.

The reference's ``RewightLayer.forward`` (``x3d_coarse.py:216-225``)
materialises a 6-D tensor ``(B, C, T_fine, T_coarse, H, W)`` — ~4 GB at the
published training shapes — to compute what is mathematically a masked,
gate-weighted contraction over fine time:

    numer[b,c,l,h,w] = sum_t  f[b,c,t,h,w] * at[b,t,h,w] * GX[b,t,l] * mask[b,t]
    denom[b,l,h,w]   = sum_t  at[b,t,h,w] * GX[b,t,l] * mask[b,t] + 1e-6
    out = numer / denom

i.e. softmax-free attention with queries = coarse locations (via the Gaussian
alignment ``GX``), keys = the learned per-frame gate, values = fine features.
On TPU we evaluate it as two einsum contractions that lower to MXU matmuls —
no giant intermediate, exact same numerics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The normalised aggregation is sensitive to contraction precision; these
# matmuls are tiny (T_f×T_c ≤ 128×33), so run them exact.
_EXACT = jax.lax.Precision.HIGHEST


def reweight_aggregate(
    feat: jax.Array,
    gate: jax.Array,
    align: jax.Array,
    mask: jax.Array,
    eps: float = 1e-6,
) -> jax.Array:
    """Aggregate fine features onto coarse temporal locations.

    Args:
      feat: ``(B, T_f, H, W, C)`` cached fine-stream features (channels-last).
      gate: ``(B, T_f, H, W)`` sigmoid self-attention gate
        (``x3d_coarse.py:216-219``).
      align: ``(B, T_f, T_c)`` Gaussian alignment matrix ``GX``.
      mask: ``(B, T_f)`` binary validity mask over fine frames.
      eps: denominator stabiliser (``+1e-6`` at ``x3d_coarse.py:224``).

    Returns:
      ``(B, T_c, H, W, C)`` fine features aligned to coarse frames.
    """
    am = gate * mask[:, :, None, None]  # (B, T_f, H, W)
    dt = feat.dtype
    denom = (
        jnp.einsum("bthw,btl->blhw", am, align, precision=_EXACT,
                   preferred_element_type=dt)
        + eps
    )
    numer = jnp.einsum(
        "bthwc,bthw,btl->blhwc", feat, am, align, precision=_EXACT,
        preferred_element_type=dt,
    )
    return numer / denom[..., None]
