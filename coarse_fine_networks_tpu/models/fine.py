"""Fine-stream X3D network (re-design of ``x3d_fine.py:179-405``).

Layout is channels-last ``(B, T, H, W, C)`` and logits are time-major
``(B, T, n_classes)`` (the reference returns ``B C T``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pools import adaptive_avg_pool_spatial
from .layers import kaiming_normal
from .x3d import X3DHead, X3DStage, X3DStem, get_blocks, get_inplanes

# Spatial size of the global-tower feature taps (x3d_fine.py:345-360).
TOWER_HW = 7
FEAT_KEYS = ("layer1", "layer2", "layer3", "layer4", "conv5")


def _resolve_trunk_layout(layout: str, x: jax.Array,
                          t_downsample: bool = False) -> str:
    """``auto`` → fold4 on TPU when the input shape folds cleanly (the
    published 224²/112²/56² trunk shapes do), ``plain`` elsewhere."""
    if layout != "auto":
        return layout
    # stem halves H/W and block0 halves again; both fold stages need rows
    # divisible by 4 (ops/fold.py) → input sides divisible by 16
    ok = (jax.default_backend() == "tpu" and not t_downsample
          and x.shape[2] % 16 == 0 and x.shape[3] % 16 == 0)
    return "fold4" if ok else "plain"


class FineNet(nn.Module):
    """X3D Fine stream.

    Modes (mirroring ``x3d_fine.py:331-382``):

    * default: per-frame (``task='loc'``) or per-clip (``task='class'``)
      logits;
    * ``extract_feat=True``: pooled head features before fc1;
    * ``global_tower=True``: dict of 5 intermediate features average-pooled to
      ``(T, 7, 7)`` — the cached-fine-feature bank consumed by the Coarse
      stream (``extract_fineFEAT.py:168-173``).
    """

    version: str = "M"
    n_classes: int = 400
    task: str = "loc"
    dropout_rate: float = 0.5
    bn_splits: int = 1
    t_downsample: bool = False
    extract_feat: bool = False
    global_tower: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    dw_impl: str = "lax"
    stem_s2d: bool = True
    stem_s2d_input: bool = False  # clips arrive pre-s2d_pack'ed
    # (B, T, H/2, W/2, 12); requires trunk_layout="fold4" (see CoarseNet)
    fold_pw: bool = False
    trunk_layout: str = "auto"  # "fold4": stem+layer1 row-folded
    # (ops/fold.py); "auto" = fold4 on TPU when shapes allow, else plain
    channel_pad: int = 1  # round mid/head widths up to this multiple so the
    # tensor-parallel tower's sharded channel dims divide the model mesh
    # axis (parallel/tensor.py); padded params are zero ⇒ outputs exact

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        planes = get_inplanes(self.version)
        blocks = get_blocks(self.version)
        x = x.astype(self.compute_dtype)

        layout = _resolve_trunk_layout(self.trunk_layout, x,
                                       self.t_downsample)
        if self.channel_pad > 1:
            # TP channel padding shards over `model`; the fold4 Pallas
            # kernels register batch-axis partitioning only — force plain.
            layout = "plain"
        if self.stem_s2d_input:
            assert self.channel_pad <= 1, \
                "stem_s2d_input is fold4-only; channel_pad > 1 forces the " \
                "plain trunk (TP) — the two are mutually exclusive"
            assert layout == "fold4" and not self.t_downsample, \
                "stem_s2d_input requires the resolved folded stem " \
                f"(layout={layout!r}, t_downsample={self.t_downsample})"
        fold1 = layout == "fold4" and not self.t_downsample
        if fold1:
            from ..ops.fold import from_fold4
            from .x3d_fold import FoldedStage, FoldedStem

            fold_dw = "auto" if self.dw_impl == "lax" else self.dw_impl
            x = FoldedStem(planes[0][1], self.bn_splits,
                           dw_impl=fold_dw,
                           s2d_input=self.stem_s2d_input,
                           name="stem")(x, train)
        else:
            x = X3DStem(planes[0][1], self.bn_splits, dw_impl=self.dw_impl,
                        s2d=self.stem_s2d, name="stem")(x, train)

        feat_g: Dict[str, jax.Array] = {}
        for i, ((mid, out), nblocks) in enumerate(zip(planes, blocks)):
            if fold1 and i == 0:
                x = FoldedStage(planes[0][1], mid, out, nblocks, stride=2,
                                bn_splits=self.bn_splits, remat=self.remat,
                                dw_impl=fold_dw, name="layer1")(x, train)
                x = from_fold4(x, out)
            else:
                x = X3DStage(
                    mid, out, nblocks, stride=2,
                    t_downsample=self.t_downsample,
                    bn_splits=self.bn_splits, remat=self.remat,
                    dw_impl=self.dw_impl, fold_pw=self.fold_pw and i == 0,
                    channel_pad=self.channel_pad,
                    name=f"layer{i + 1}",
                )(x, train)
            if self.global_tower:
                feat_g[f"layer{i + 1}"] = adaptive_avg_pool_spatial(x, TOWER_HW)

        x = X3DHead(planes[3][0], self.bn_splits,
                    channel_pad=self.channel_pad, name="head")(x, train)
        if self.global_tower:
            # public feature surface: slice any TP channel padding back off
            feat_g["conv5"] = adaptive_avg_pool_spatial(
                x[..., : planes[3][0]], TOWER_HW)
            return feat_g

        # Task pooling (x3d_fine.py:252-255, 366): 'loc' keeps T.
        if self.task == "class":
            x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        else:
            x = jnp.mean(x, axis=(2, 3), keepdims=True)
        if self.extract_feat:
            return x[..., : planes[3][0]]

        x = nn.Conv(2048, (1, 1, 1), use_bias=False, name="fc1",
                    kernel_init=kaiming_normal, dtype=x.dtype)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], x.shape[1], 2048)  # (B, T, 2048); T=1 if class
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.n_classes, name="fc2",
                     dtype=self.compute_dtype)(x.astype(self.compute_dtype))
        return x.astype(jnp.float32)  # (B, T, n_classes)
