"""Joint Coarse-Fine inference pipeline: one jitted program.

The reference runs three scripts with an on-disk feature cache between them
(``extract_fineFEAT.py:168-173`` writes ``FINE_SAVE_DIR/<key>/<vid>``, which
``charades_coarse_fineFEAT.py:77-89`` reads back).  For serving that boundary
is pure overhead: here the fine global tower, the fusion graph and the coarse
stream compose into a single jitted forward — the 7x7 feature bank never
leaves HBM.  Measured 26.7 videos/s/chip vs the reference's ~0.37
videos/s/GPU whole-video eval (PERF.md).

The two halves are also exposed separately (:meth:`CoarseFinePipeline.extract`
and :meth:`CoarseFinePipeline.fuse`) so a serving-side feature cache
(:mod:`..serve.feature_cache`) can skip the fine tower on repeat videos —
the serving-time analogue of the reference's disk boundary, but keyed and
evicted in memory.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resample import linear_resize
from .coarse import CoarseNet
from .fine import FineNet


class CoarseFinePipeline(nn.Module):
    """Fine tower (``global_tower=True``) feeding the Coarse stream in one
    program.

    Inputs:
      clips:      ``(B, T, H, W, 3)`` coarse-stream clip (strided frames).
      fine_clips: ``(B, T_f, H, W, 3)`` fine-stream frames (denser stride).
      meta:       ``(B, 4)`` ``[start_f, frames, nf, stride]/gamma_tau`` as in
                  ``charades_coarse_fineFEAT.py:199-200``.
      label_len:  output temporal length (per-frame logits are linearly
                  resized, ``train_coarse_fineFEAT.py:226``).

    Returns per-frame class probabilities ``(B, label_len, n_classes)``.
    """

    n_classes: int = 157
    version: str = "M"
    crops: int = 1
    compute_dtype: jnp.dtype = jnp.float32
    dw_impl: str = "lax"
    trunk_layout: str = "auto"  # serving gets the fold4 trunk on TPU too

    def setup(self):
        # attribute names fix the param-tree names ("fine"/"coarse"), keeping
        # checkpoints from the previous @nn.compact layout loadable
        self.fine = FineNet(
            version=self.version, n_classes=self.n_classes, task="loc",
            global_tower=True, compute_dtype=self.compute_dtype,
            dw_impl=self.dw_impl, trunk_layout=self.trunk_layout,
        )
        self.coarse = CoarseNet(
            version=self.version, n_classes=self.n_classes, task="loc",
            t_pool="grid", learned_mixing=True, is_mixing=True,
            crops=self.crops, compute_dtype=self.compute_dtype,
            dw_impl=self.dw_impl, trunk_layout=self.trunk_layout,
        )

    def extract(self, fine_clips: jax.Array) -> Dict[str, jax.Array]:
        """Fine-stream global tower: ``(B, T_f, H, W, 3)`` → dict of five
        ``(B, T_f, 7, 7, C)`` feature banks (``extract_fineFEAT.py:103-106``)."""
        feats = self.fine(fine_clips, train=False)
        return {k: v.astype(jnp.float32) for k, v in feats.items()}

    def fuse(self, clips: jax.Array, feats: Dict[str, jax.Array],
             feat_mask: jax.Array, meta: jax.Array,
             label_len: int | None = None) -> jax.Array:
        """Fusion graph + coarse stream over precomputed fine features."""
        if label_len is None:
            label_len = 4 * clips.shape[1]
        logits = self.coarse(clips, feats, feat_mask.astype(jnp.float32),
                             meta, False)
        logits = linear_resize(logits, label_len, align_corners=False)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    def __call__(self, clips: jax.Array, fine_clips: jax.Array,
                 meta: jax.Array, label_len: int | None = None,
                 fine_mask: jax.Array | None = None) -> jax.Array:
        """``fine_mask`` (B, T_f): validity of each fine frame.  Serving pads
        every request up to its geometric bucket — without the mask, the
        BN-biased activations of zero-padded fine frames would be fused as
        valid features and the output would depend on which padding bucket a
        video lands in (the reference masks invalid feature frames,
        ``charades_coarse_fineFEAT.py:235-247``)."""
        feats = self.extract(fine_clips)
        if fine_mask is None:
            feat_mask = jnp.ones(fine_clips.shape[:2], jnp.float32)
        else:
            feat_mask = fine_mask.astype(jnp.float32)
        return self.fuse(clips, feats, feat_mask, meta, label_len)
