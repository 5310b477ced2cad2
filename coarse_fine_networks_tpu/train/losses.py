"""Detection losses, matching the reference drivers.

The reference uses ``nn.BCELoss`` on sigmoid probabilities with a
classification term (mean BCE over max-over-time probabilities) and a
localisation term (sum BCE over masked frames, normalised by
``sum(masks) * n_classes``) averaged together
(``train_fine.py:136-137, 209-226``; identical in
``train_coarse_fineFEAT.py:149-150, 236-270``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# torch BCELoss clamps each log term at -100 for numerical safety.
_LOG_CLAMP = -100.0


def bce_loss(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary cross-entropy on probabilities (torch ``BCELoss``
    semantics, including the -100 log clamp).

    The clamp is applied with the double-``where`` pattern so the backward
    pass is NaN-free at exactly-saturated probabilities: masked frames carry
    ``p == 0`` (probs are pre-multiplied by the frame mask), and a plain
    ``maximum(log(p), -100)`` sends ``0 * d log(0) = 0 * inf = NaN`` through
    the VJP.  In the clamped region the gradient is 0 (torch instead clamps
    the backward denominator by eps — same effect: training survives
    saturation; the region is |log p| > 100, i.e. p < 4e-44).
    """
    tiny = jnp.exp(jnp.asarray(_LOG_CLAMP, probs.dtype))
    in_lo = probs > tiny          # log(p) > -100
    in_hi = probs < 1.0           # log1p(-p) > -100 (f32: 1-eps still < 1.0)
    logp = jnp.where(in_lo, jnp.log(jnp.where(in_lo, probs, 1.0)), _LOG_CLAMP)
    log1mp = jnp.where(
        in_hi, jnp.log1p(-jnp.where(in_hi, probs, 0.0)), _LOG_CLAMP)
    return -(targets * logp + (1.0 - targets) * log1mp)


def detection_loss(
    probs: jax.Array,     # (B, T_l, C) sigmoid probabilities, already masked
    labels: jax.Array,    # (B, T_l, C)
    masks: jax.Array,     # (B, T_l)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns ``(total, cls_loss, loc_loss)``.

    ``total = (cls + loc) / 2`` (``train_fine.py:226``).
    """
    n_classes = labels.shape[-1]
    cls = jnp.mean(
        bce_loss(jnp.max(probs, axis=1), jnp.max(labels, axis=1))
    )
    loc = jnp.sum(bce_loss(probs, labels)) / (jnp.sum(masks) * n_classes)
    return (cls + loc) / 2.0, cls, loc
