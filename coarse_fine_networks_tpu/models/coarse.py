"""Coarse-stream X3D with Grid Pool / Unpool and multi-stage fusion.

Re-design of ``x3d_coarse.py:175-750`` with three structural TPU-first moves:

1. **Fusion at canonical 7×7.**  The cached fine features are 7×7; the
   reference upsamples them to each stage's resolution by replication
   (``adaptive_max_pool2d``, ``x3d_coarse.py:213-214``), runs 1×1 convs, and
   pools back (``x3d_coarse.py:312-325``).  Every op in that pipeline is
   pointwise or replication-compatible, so computing the whole fusion branch
   at 7×7 and replicating the final scale/bias maps is *numerically exact*
   and ~64× cheaper (validated in ``tests/test_fusion_ops.py``).
2. **Reweight attention as einsums** — see :mod:`..ops.reweight`.
3. **Grid Pool/Unpool as hat-matrix matmuls** — see :mod:`..ops.resample`.

Logits are time-major ``(B, T, n_classes)``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.gaussian import gaussian_alignment
from ..ops.grid_pool import cdf_knots
from ..ops.resample import inverse_cdf, linear_resize, temporal_resample
from ..ops.reweight import reweight_aggregate
from ..ops.pools import spatial_replicate
from .layers import SubBatchNorm, kaiming_normal
from .x3d import X3DHead, X3DStage, X3DStem, get_blocks, get_inplanes

DEFAULT_FEAT_DEPTH = {
    "layer1": 24, "layer2": 48, "layer3": 96, "layer4": 192, "conv5": 432,
}
# Channel widths of the four per-level bias/scale maps concatenated by the
# mixing layer (x3d_coarse.py:297).
MIX_LEVELS = (24, 48, 96, 192)


class _Conv3Param(nn.Module):
    """Canonical 3x3x3 conv kernel+bias parameters (same subtree as an
    ``nn.Conv`` of the plain path) for the fold-consuming score conv."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kaiming_normal, self.shape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],),
                       jnp.float32)
        return k, b


class GridPool(nn.Module):
    """Learned differentiable temporal downsampler (``GridPoolLayer``,
    ``x3d_coarse.py:355-416``).

    A small conv score head predicts per-region confidence; ``1 - p`` becomes
    a sampling CDF (inverse-transform sampling) and the feature tensor is
    linearly resampled at the CDF knots, so confident temporal regions are
    sampled densely.  Returns ``(x_pooled (B, T/r + 1, H, W, C), knots)``.

    With ``fold_c`` set the input (and pooled output) are fold4-layout
    (``ops/fold.py``) with ``fold_c`` logical channels: conv1 consumes the
    folded rows via a scattered kernel and the temporal resample — T-linear
    and layout-agnostic — runs in fold space, so the trunk is never unfolded
    at full T (the unfold happens downstream at T/ratio).
    """

    depth: int
    ratio: int = 4
    fold_c: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> Tuple[jax.Array, jax.Array]:
        t = x.shape[1]
        r2 = self.ratio // 2
        if self.fold_c is not None:
            from ..ops.fold import (FOLD, fold_gridpool_conv1_kernel,
                                    unfold2_rows)

            p_in = x.shape[-1] // FOLD
            k, bias = _Conv3Param((3, 3, 3, self.fold_c, self.depth),
                                  name="conv1")()
            k2 = fold_gridpool_conv1_kernel(k, self.fold_c, self.depth, p_in)
            g = jax.lax.conv_general_dilated(
                x, k2.astype(x.dtype), (r2, 1, 2),
                [(1, 1), (1, 0), (1, 1)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            g = unfold2_rows(g, self.depth) + bias.astype(g.dtype)
        else:
            g = nn.Conv(self.depth, (3, 3, 3), strides=(r2, 2, 2), padding=1,
                        use_bias=True, name="conv1",
                        kernel_init=kaiming_normal, dtype=x.dtype)(x)
        g = nn.relu(SubBatchNorm(self.depth, 1, name="bn1")(g, train))
        g = nn.Conv(self.depth, (3, 3, 3), strides=(r2, 2, 2), padding=1,
                    use_bias=True, name="conv2", kernel_init=kaiming_normal,
                    dtype=x.dtype)(g)
        g = nn.relu(SubBatchNorm(self.depth, 1, name="bn2")(g, train))
        g = nn.Conv(1, (1, 3, 3), strides=(1, 2, 2), padding=(0, 1, 1),
                    use_bias=True, name="conv3", kernel_init=kaiming_normal,
                    dtype=x.dtype)(g)
        scores = jnp.mean(g, axis=(2, 3))[..., 0]  # (B, T/r)
        knots = cdf_knots(scores.astype(jnp.float32))  # (B, T/r + 1)
        pooled = temporal_resample(x, knots.astype(x.dtype) * (t - 1))
        return pooled, knots


def grid_unpool_logits(logits: jax.Array, knots: jax.Array) -> jax.Array:
    """Invert Grid Pool on per-frame logits (``GridUnpool`` +
    the ×4 linear upsample, ``x3d_coarse.py:419-451, 723-725``).

    Args:
      logits: ``(B, K, C)`` coarse-time logits.
      knots: ``(B, K)`` grid-pool CDF knots.

    Returns:
      ``(B, (K-1)*4, C)`` logits resampled back to uniform time.
    """
    k = knots.shape[1]
    inv = inverse_cdf(knots)  # (B, K) in [0, 1]
    out = temporal_resample(logits, inv.astype(logits.dtype) * (k - 1))
    return linear_resize(out, (k - 1) * 4, align_corners=True)


class RewightLayer(nn.Module):
    """Self-attention filtering + Gaussian-aligned aggregation of fine
    features, producing per-stage bias & scale maps (``x3d_coarse.py:175-247``).

    Operates at canonical 7×7 (see module docstring); outputs
    ``(bias, scale)`` of shape ``(B, T_c, 7, 7, channels)`` (or spatially
    pooled to 1×1 when ``pool=True`` — the logit-level ``rw6`` instance,
    ``x3d_coarse.py:539``).
    """

    channels: int
    g_channels: Optional[int]
    depth: int
    pool: bool = False
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(
        self,
        feat: jax.Array,      # (B, T_f, 7, 7, depth)
        mask: jax.Array,      # (B, T_f)
        align: jax.Array,     # (B, T_f, T_c)
        is_mixing: bool,
        train: bool,
    ):
        if feat.shape[1] != mask.shape[1]:
            raise ValueError(
                f"fine-feature length {feat.shape[1]} != mask {mask.shape[1]}"
            )
        d = self.depth
        # Attention gate: two pointwise convs + sigmoid (x3d_coarse.py:216-219).
        at = nn.Dense(d, name="at1", dtype=feat.dtype)(feat)
        at = nn.relu(at)
        at = nn.Dense(1, name="at2", dtype=feat.dtype)(at)
        gate = jax.nn.sigmoid(at)[..., 0]  # (B, T_f, 7, 7)

        x = reweight_aggregate(feat, gate, align.astype(feat.dtype), mask)
        if self.pool:
            x = jnp.mean(x, axis=(2, 3), keepdims=True)  # (B, T_c, 1, 1, d)

        # Bias head fc1/fc2 (x3d_coarse.py:232-236).
        x1 = nn.relu(nn.Dense(d, name="fc1", dtype=x.dtype)(x))
        if self.pool:
            x1 = nn.Dropout(self.dropout_rate, deterministic=not train)(x1)
        x1 = nn.Dense(self.channels, name="fc2", dtype=x.dtype)(x1)

        if self.g_channels is None:
            return x1
        # Scale head fc3/fc4 (x3d_coarse.py:238-246).
        x2 = nn.relu(nn.Dense(d, name="fc3", dtype=x.dtype)(x))
        if self.pool:
            x2 = nn.Dropout(self.dropout_rate, deterministic=not train)(x2)
        x2 = nn.Dense(self.g_channels, name="fc4", dtype=x.dtype)(x2)
        if not is_mixing:
            x2 = jax.nn.sigmoid(x2)
        return x1, x2


class MixingLayer(nn.Module):
    """Learned mixing of the four per-level bias/scale maps into one
    stage-conditioned scale & bias (``x3d_coarse.py:289-351``).

    ``learned=False`` selects the level whose width matches the stage (the
    reference's unlearned branch is shape-inconsistent dead code at
    ``x3d_coarse.py:338-344``; we implement its intent).
    """

    depth: int
    learned: bool = True
    is_logit: bool = False
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(
        self,
        bias_list: Sequence[jax.Array],   # each (B, T_c, 7, 7, C_l)
        scale_list: Sequence[jax.Array],
        out_hw: int,
        train: bool,
    ) -> Tuple[jax.Array, jax.Array]:
        # The reference max-pools each per-level map to the stage resolution
        # *before* the learned mixing conv (x3d_coarse.py:312-325).  For
        # out_hw >= 7 the pool acts on replicated 7×7 content and commutes
        # with the pointwise conv, so we stay at canonical 7×7; for smaller
        # stages (non-224 inputs) we must pool first to match.
        if out_hw < 7:
            from ..ops.pools import adaptive_max_pool_spatial

            bias_list = [adaptive_max_pool_spatial(b, out_hw) for b in bias_list]
            scale_list = [adaptive_max_pool_spatial(s, out_hw) for s in scale_list]
        cs = jnp.concatenate(list(bias_list), axis=-1)   # (B, T_c, hw, hw, 360)
        ms = jnp.concatenate(list(scale_list), axis=-1)
        if self.learned:
            if self.is_logit:
                drop = nn.Dropout(self.dropout_rate, deterministic=not train)
                cs, ms = drop(cs), drop(ms)
            cs = nn.Dense(self.depth, name="conv_at", dtype=cs.dtype)(cs)
            ms = jax.nn.sigmoid(
                nn.Dense(self.depth, name="conv_at2", dtype=ms.dtype)(ms)
            )
        else:
            level = list(MIX_LEVELS).index(self.depth)
            cs = bias_list[level]
            ms = scale_list[level]
        return cs, ms


class CoarseNet(nn.Module):
    """Coarse stream: X3D trunk + Grid Pool + multi-stage fusion + Grid Unpool
    (``x3d_coarse.py:455-750``)."""

    version: str = "M"
    n_classes: int = 400
    task: str = "loc"
    dropout_rate: float = 0.5
    bn_splits: int = 1
    t_pool: Optional[str] = "grid"      # avg | max | stride | grid | None
    learned_mixing: bool = True
    is_mixing: bool = True
    crops: int = 1
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    dw_impl: str = "lax"
    stem_s2d: bool = True
    stem_s2d_input: bool = False  # clips arrive pre-s2d_pack'ed
    # (B, T, H/2, W/2, 12) from the input pipeline
    # (device_normalize(s2d=True)) so the step skips the relayout chain;
    # requires trunk_layout="fold4"
    fold_pw: bool = False
    trunk_layout: str = "auto"  # "fold4": stem+layer1 in the row-folded
    # lane-filling layout (ops/fold.py) — same params/math, 2-4x less HBM;
    # "auto" = fold4 on TPU when the input shape folds cleanly
    feat_depth: Tuple[Tuple[str, int], ...] = tuple(DEFAULT_FEAT_DEPTH.items())

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                     # (B', T, H, W, 3), B' = B*crops
        feats: Dict[str, jax.Array],      # each (B, T_f, 7, 7, C_k)
        feat_mask: jax.Array,             # (B, T_f)
        meta: jax.Array,                  # (B, 4)
        train: bool = False,
    ) -> jax.Array:
        planes = get_inplanes(self.version)
        blocks = get_blocks(self.version)
        fd = dict(self.feat_depth)
        x = x.astype(self.compute_dtype)
        t_in = x.shape[1]

        from .fine import _resolve_trunk_layout

        if self.stem_s2d_input:
            assert self.trunk_layout == "fold4", \
                "stem_s2d_input requires trunk_layout='fold4'"
        folded = _resolve_trunk_layout(self.trunk_layout, x) == "fold4"
        if folded:
            from ..ops.fold import from_fold4
            from .x3d_fold import FoldedStage, FoldedStem

            fold_dw = "auto" if self.dw_impl == "lax" else self.dw_impl
            x = FoldedStem(planes[0][1], self.bn_splits,
                           dw_impl=fold_dw,
                           s2d_input=self.stem_s2d_input,
                           name="stem")(x, train)
            x = FoldedStage(planes[0][1], planes[0][0], planes[0][1],
                            blocks[0], stride=2, bn_splits=self.bn_splits,
                            remat=self.remat, dw_impl=fold_dw,
                            name="layer1")(x, train)
            # the trunk stays folded through the (T-only) temporal pooling —
            # the fold exit runs at T/ratio instead of full T, removing the
            # full-res 56^2 relayout copies (PERF.md round-3)
        else:
            x = X3DStem(planes[0][1], self.bn_splits, dw_impl=self.dw_impl,
                        s2d=self.stem_s2d, name="stem")(x, train)
            x = X3DStage(planes[0][0], planes[0][1], blocks[0], stride=2,
                         bn_splits=self.bn_splits, remat=self.remat,
                         dw_impl=self.dw_impl, fold_pw=self.fold_pw,
                         name="layer1")(x, train)

        knots = None
        if self.t_pool == "avg":
            x = nn.avg_pool(x, (4, 1, 1), strides=(4, 1, 1))
        elif self.t_pool == "max":
            x = nn.max_pool(x, (4, 1, 1), strides=(4, 1, 1))
        elif self.t_pool == "stride":
            x = x[:, ::4]
        elif self.t_pool == "grid":
            x, knots = GridPool(planes[0][1],
                                fold_c=planes[0][1] if folded else None,
                                name="pool_1")(x, train)
        if folded:
            x = from_fold4(x, planes[0][1])

        # Gaussian alignment fine-time ↔ coarse locations (x3d_coarse.py:650-653).
        if knots is not None:
            align = gaussian_alignment(meta, feat_mask, knots, t_in,
                                       crops=self.crops)
        else:
            align = gaussian_alignment(meta, feat_mask, None, t_in,
                                       coarse_len=x.shape[1], crops=self.crops)

        # Multi-crop testing: fine features/masks are per-sample, the coarse
        # batch is per-crop (x3d_coarse.py:209-211).
        if self.crops > 1:
            feats = {k: jnp.repeat(v, self.crops, axis=0) for k, v in feats.items()}
            feat_mask = jnp.repeat(feat_mask, self.crops, axis=0)

        def rw(name, key, channels):
            return RewightLayer(
                channels=channels, g_channels=channels, depth=fd[key],
                dropout_rate=self.dropout_rate, name=name,
            )(feats[key].astype(x.dtype), feat_mask, align, self.is_mixing, train)

        rw_out = [
            rw("rw2", "layer1", planes[0][1]),
            rw("rw3", "layer2", planes[1][1]),
            rw("rw4", "layer3", planes[2][1]),
            rw("rw5", "layer4", planes[3][1]),
        ]
        bias_list = [b for b, _ in rw_out]
        scale_list = [s for _, s in rw_out]

        def apply_mod(h, cs, ms):
            """x * scale + bias with 7×7 maps replicated to the stage's H×W
            (exact equivalent of the reference's pooled maps — see module
            docstring)."""
            hw = h.shape[2]
            return h * spatial_replicate(ms, hw) + spatial_replicate(cs, hw)

        if self.is_mixing:
            for i, stage in enumerate(("layer2", "layer3", "layer4", None)):
                cs, ms = MixingLayer(
                    depth=planes[i][1], learned=self.learned_mixing,
                    dropout_rate=self.dropout_rate, name=f"mix{i + 2}",
                )(bias_list, scale_list, x.shape[2], train)
                x = apply_mod(x, cs, ms)
                if stage is not None:
                    x = X3DStage(planes[i + 1][0], planes[i + 1][1],
                                 blocks[i + 1], stride=2,
                                 bn_splits=self.bn_splits, remat=self.remat,
                                 dw_impl=self.dw_impl, name=stage)(x, train)
        else:
            for i, stage in enumerate(("layer2", "layer3", "layer4", None)):
                x = apply_mod(x, bias_list[i], scale_list[i])
                if stage is not None:
                    x = X3DStage(planes[i + 1][0], planes[i + 1][1],
                                 blocks[i + 1], stride=2,
                                 bn_splits=self.bn_splits, remat=self.remat,
                                 dw_impl=self.dw_impl, name=stage)(x, train)

        x = X3DHead(planes[3][0], self.bn_splits, name="head")(x, train)

        if self.task == "class":
            x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        else:
            x = jnp.mean(x, axis=(2, 3), keepdims=True)

        x = nn.Conv(2048, (1, 1, 1), use_bias=False, name="fc1",
                    kernel_init=kaiming_normal, dtype=x.dtype)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], x.shape[1], 2048)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.n_classes, name="fc2",
                          dtype=self.compute_dtype)(x)  # (B', T_c, K)

        # Logit-level fusion rw6 (x3d_coarse.py:719-721): maps at 1×1.
        rb, rs = RewightLayer(
            channels=self.n_classes, g_channels=self.n_classes,
            depth=fd["conv5"], pool=True, dropout_rate=self.dropout_rate,
            name="rw6",
        )(feats["conv5"].astype(x.dtype), feat_mask, align, False, train)
        logits = logits * rs[:, :, 0, 0, :] + rb[:, :, 0, 0, :]
        logits = logits.astype(jnp.float32)

        if self.t_pool == "grid":
            logits = grid_unpool_logits(logits, knots)
        return logits
