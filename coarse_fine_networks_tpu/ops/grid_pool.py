"""Grid-pool CDF construction (the learned temporal sampler's math core).

``GridPoolLayer.forward`` (``x3d_coarse.py:373-416``) turns per-region
confidence scores into a sampling CDF; the conv score head lives in
:mod:`coarse_fine_networks_tpu.models.coarse` — here is the pure math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cdf_knots(scores: jax.Array) -> jax.Array:
    """Confidence scores → cumulative sampling-grid knots.

    Args:
      scores: ``(B, T/r)`` raw region scores (pre-sigmoid) from the score head.

    Returns:
      ``(B, T/r + 1)`` monotone knots in ``[0, 1]`` with a leading zero —
      the inverse-transform-sampling CDF of ``1 - sigmoid(scores * 0.5)``
      (``x3d_coarse.py:384-392``).  High-confidence regions get small CDF
      increments, i.e. denser sampling.
    """
    p = jax.nn.sigmoid(scores * 0.5)
    w = 1.0 - p
    w = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-16)
    cdf = jnp.cumsum(w, axis=1)
    zero = jnp.zeros((scores.shape[0], 1), dtype=cdf.dtype)
    return jnp.concatenate([zero, cdf], axis=1)
