"""Fold4-layout X3D stem and stage (see ``ops/fold.py`` for the layout).

These modules are *exact relayouts* of the plain modules in ``models/x3d.py``
(the reference ops at ``x3d_fine.py:89-224``): they consume the **same
canonical parameters** (identical pytree names/shapes, so checkpoints and the
torch converter are untouched) but compute in the row-folded ``(B, T, H/4, W,
4P)`` layout where C=24/54 fills the 128-lane registers instead of paying the
2.4-5.3x channels-minor padding tax.  Depthwise 3x3x3 convs dispatch to the
fold-space Pallas stencil (``ops/pallas/dw_fold.py``) on TPU and to an exact
unfold->XLA->refold sandwich elsewhere.

Numerical parity with the plain modules is tested in ``tests/test_fold.py``
(same variables applied through both paths).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fold import (
    FOLD,
    fold_downsample_kernel,
    fold_matmul,
    fold_pad,
    fold_pointwise_kernel,
    pad_vec,
    to_fold4,
)
from ..ops.pallas.dw_fold import (dw_fold4_mm_bn_train, fold_dw_bnrelu_conv3d,
                                  fold_dw_conv3d, fold_dw_mm_bnrelu_conv3d,
                                  resolve_mm_train_impl)
from .layers import kaiming_normal, round_width, swish
from .x3d import _Conv1sParam, _Conv1x1Param


class _KernelParam(nn.Module):
    """Canonical kernel parameter holder (same subtree as the plain module
    that owns the kernel: a single ``kernel`` param)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_normal, self.shape, jnp.float32)


def fold_downsample_pw(x: jax.Array, w: jax.Array, c_in: int,
                       c_out: int) -> jax.Array:
    """Pointwise 1x1x1 conv with stride (1,2,2) in fold space (the residual
    downsample of ``x3d_fine.py:144-149``), as one strided conv consuming
    fold4 rows directly (:func:`..ops.fold.fold_downsample_kernel`) — both
    directions stay in the standard fold4 conv layout, so XLA's conv
    emitters handle the subsample (fwd) and the zero-interleave (input grad)
    without strided-slice relayouts or scatter-adds."""
    p = x.shape[-1] // FOLD
    k = fold_downsample_kernel(w, c_in, c_out, p_in=p).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, (1, 2, 2), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class FoldedSubBatchNorm(nn.Module):
    """SubBatchNorm on a fold4 tensor — same parameters and running-stat
    semantics as :class:`..models.layers.SubBatchNorm`; statistics are taken
    over the real channels only (pad lanes stay exactly zero: the affine
    scale/bias vectors are zero-filled in the pad lanes)."""

    features: int
    num_splits: int = 1
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool,
                 scale_bias: bool = False,
                 pre_matmul: jax.Array | None = None,
                 dw_fuse: tuple | None = None):
        """``scale_bias=True`` returns per-lane ``(sc, bi)`` f32 vectors such
        that ``relu(x*sc + bi)`` equals ``relu(BN(x))`` — consumed by the
        fused stencil kernels (:func:`..ops.pallas.dw_fold.
        fold_dw_bnrelu_conv3d`) instead of materialising the normalized
        tensor.  Running stats update exactly as in the normal path.  Only
        expressible when training stats are batch-global (num_splits == 1).

        ``pre_matmul`` (a folded pointwise matrix ``(4P_in, 4P_out)``): the
        statistics are those of ``x @ pre_matmul`` — computed via the lane
        second-moment identity ``E[(xW)_o^2] = (Wᵀ E[xxᵀ] W)_oo`` so the conv
        output is never materialised (consumed by the matmul-fused stencil
        kernels, :func:`..ops.pallas.dw_fold.fold_dw_mm_bnrelu_conv3d`).
        Requires ``scale_bias=True`` and batch-global stats.

        ``dw_fuse=(wmm, w_dw, stride, interpret)``: TRAIN-mode fully-fused
        bottleneck entry — runs ``dw_conv(relu(BN_train(x @ wmm)))`` through
        one closed-form-VJP composite
        (:func:`..ops.pallas.dw_fold.dw_fold4_mm_bn_train`) and returns the
        conv output; this module supplies gamma/beta and absorbs the
        running-stat update.  Same parameter/stat tree as every other mode."""
        s, c = self.num_splits, self.features
        dtype = jnp.float32
        lanes_out = (pre_matmul.shape[1] if pre_matmul is not None
                     else dw_fuse[0].shape[1] if dw_fuse is not None
                     else x.shape[-1])
        p = lanes_out // FOLD
        if scale_bias and train and s != 1:
            raise ValueError("fused scale_bias needs num_splits == 1")
        if pre_matmul is not None and not scale_bias:
            raise ValueError("pre_matmul stats require scale_bias=True")
        if dw_fuse is not None and not (train and s == 1 and self.affine):
            raise ValueError("dw_fuse needs train, num_splits == 1, affine")

        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), dtype))
        sp_mean = self.variable("batch_stats", "split_mean",
                                lambda: jnp.zeros((s * c,), dtype))
        sp_var = self.variable("batch_stats", "split_var",
                               lambda: jnp.ones((s * c,), dtype))

        if dw_fuse is not None:
            scale = self.param("scale", nn.initializers.ones, (c,), dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), dtype)
            wmm, w_dw, stride, interpret = dw_fuse
            y, mean, var = dw_fold4_mm_bn_train(
                x, wmm, w_dw, scale, bias, c, stride, self.eps, interpret)
            if not self.is_initializing():
                count = (x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
                         * FOLD)
                unbiased = var * (count / max(count - 1, 1))
                m = self.momentum
                sp_mean.value = (1 - m) * sp_mean.value + m * mean
                sp_var.value = (1 - m) * sp_var.value + m * unbiased
            return y

        orig_dtype = x.dtype
        xf = x.astype(dtype)
        xn = None

        if train:
            n = xf.shape[0]
            if n % s != 0:
                raise ValueError(f"batch {n} not divisible by num_splits {s}")
            if pre_matmul is not None:
                # moments of x @ W without materialising the product: the
                # matmul is pointwise over positions, so per output lane o
                # E[(xW)_o] = (E[x] W)_o and E[(xW)_o^2] = (Wt E[xxt] W)_oo
                # — one (4P_in, 4P_in) MXU contraction over all positions.
                wmf = pre_matmul.astype(dtype)
                nel = n * xf.shape[1] * xf.shape[2] * xf.shape[3]
                m_in = jnp.mean(xf, axis=(0, 1, 2, 3))          # (4P_in,)
                # Gram on the ORIGINAL dtype (bf16 MXU rate, f32 accum) —
                # an f32 cast adds no information and would materialise an
                # f32 copy of the whole trunk tensor
                m2_in = jnp.einsum("bthwi,bthwj->ij", x, x,
                                   preferred_element_type=dtype) / nel
                m_l = m_in @ wmf                                # (4P_out,)
                m2_l = jnp.einsum("io,ij,jo->o", wmf, m2_in, wmf,
                                  preferred_element_type=dtype)
                mean = m_l.reshape(1, FOLD, p).mean(axis=1)[:, :c]
                mean2 = m2_l.reshape(1, FOLD, p).mean(axis=1)[:, :c]
                var = jnp.maximum(mean2 - jnp.square(mean), 0.0)  # see layers.py: one-pass var can cancel negative
            elif s == 1:
                # fast path: no singleton group axis (the 6-D reshape makes
                # XLA pick a batch-major layout for the backward reduction,
                # inserting full-tensor relayout copies around the adjacent
                # Pallas calls)
                m_l = jnp.mean(xf, axis=(0, 1, 2, 3))
                m2_l = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3))
                mean = m_l.reshape(1, FOLD, p).mean(axis=1)[:, :c]
                mean2 = m2_l.reshape(1, FOLD, p).mean(axis=1)[:, :c]
                var = jnp.maximum(mean2 - jnp.square(mean), 0.0)  # see layers.py: one-pass var can cancel negative
                if not scale_bias:
                    mean_lane = pad_vec(mean[0], c, p, 0.0)
                    var_lane = pad_vec(var[0], c, p, 1.0)
                    xn = (xf - mean_lane) * jax.lax.rsqrt(
                        var_lane + self.eps)
            else:
                xg = xf.reshape((n // s, s) + xf.shape[1:])
                # per-split, per-lane moments over (group, t, Hb, w) ...
                m_l = jnp.mean(xg, axis=(0, 2, 3, 4))              # (s, 4P)
                m2_l = jnp.mean(jnp.square(xg), axis=(0, 2, 3, 4))
                # ... phase-averaged to per-channel (every lane holds the
                # same number of real rows, so this equals the plain
                # reduction)
                mean = m_l.reshape(s, FOLD, p).mean(axis=1)[:, :c]
                mean2 = m2_l.reshape(s, FOLD, p).mean(axis=1)[:, :c]
                var = jnp.maximum(mean2 - jnp.square(mean), 0.0)  # see layers.py: one-pass var can cancel negative
                mean_lane = jax.vmap(lambda v: pad_vec(v, c, p, 0.0))(mean)
                var_lane = jax.vmap(lambda v: pad_vec(v, c, p, 1.0))(var)
                shape = (1, s, 1, 1, 1, FOLD * p)
                xn = (xg - mean_lane.reshape(shape)) * jax.lax.rsqrt(
                    var_lane.reshape(shape) + self.eps)
                xn = xn.reshape(xf.shape)
            if not self.is_initializing():
                count = (n // s) * xf.shape[1] * xf.shape[2] * xf.shape[3] * FOLD
                unbiased = var * (count / max(count - 1, 1))
                m = self.momentum
                sp_mean.value = (1 - m) * sp_mean.value + m * mean.reshape(-1)
                sp_var.value = (1 - m) * sp_var.value + m * unbiased.reshape(-1)
            mean_c, var_c = mean[0], var[0]
        else:
            mean_c, var_c = ra_mean.value, ra_var.value
            if not scale_bias:
                xn = (xf - pad_vec(mean_c, c, p, 0.0)) * jax.lax.rsqrt(
                    pad_vec(var_c, c, p, 1.0) + self.eps)

        scale = bias = None
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,), dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), dtype)

        if scale_bias:
            sc_c = jax.lax.rsqrt(var_c + self.eps)
            if scale is not None:
                sc_c = sc_c * scale
            bi_c = -mean_c * sc_c
            if bias is not None:
                bi_c = bi_c + bias
            return pad_vec(sc_c, c, p, 0.0), pad_vec(bi_c, c, p, 0.0)

        if self.affine:
            xn = xn * pad_vec(scale, c, p, 0.0) + pad_vec(bias, c, p, 0.0)
        return xn.astype(orig_dtype)


class FoldedSqueezeExcite(nn.Module):
    """SE block on a fold4 tensor — same fc1/fc2 parameters as the plain
    :class:`..models.layers.SqueezeExcite` (x3d_fine.py:123-128)."""

    planes: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.planes
        p = x.shape[-1] // FOLD
        width = round_width(c)
        m = jnp.mean(x, axis=(1, 2, 3))                        # (B, 4P)
        m = m.reshape(-1, FOLD, p).mean(axis=1)[:, :c]         # (B, C)
        s = m[:, None, None, None, :].astype(x.dtype)
        s = nn.Conv(width, (1, 1, 1), use_bias=True, name="fc1",
                    kernel_init=kaiming_normal, dtype=x.dtype)(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1, 1), use_bias=True, name="fc2",
                    kernel_init=kaiming_normal, dtype=x.dtype)(s)
        g = jax.nn.sigmoid(s)[:, 0, 0, 0, :]                   # (B, C)
        g_lane = jax.vmap(lambda v: pad_vec(v, c, p, 0.0))(g)  # (B, 4P)
        return x * g_lane[:, None, None, None, :]


class FoldedBottleneck(nn.Module):
    """X3D bottleneck in fold space (parameters identical to
    :class:`..models.x3d.Bottleneck`): block-diagonal fold matmuls for the
    pointwise convs, the fold-space stencil for the depthwise 3x3x3."""

    in_planes: int
    mid_planes: int
    out_planes: int
    stride: int = 1
    use_se: bool = False
    has_downsample: bool = False
    bn_splits: int = 1
    dw_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c_in, c_mid, c_out = self.in_planes, self.mid_planes, self.out_planes
        p_in = x.shape[-1] // FOLD
        residual = x

        w1 = _Conv1x1Param(c_in, c_mid, name="conv1")()
        wmm = fold_pointwise_kernel(w1, c_in, c_mid, p_in=p_in).astype(x.dtype)
        w2 = _KernelParam((3, 3, 3, 1, c_mid), name="conv2")()
        bn1 = FoldedSubBatchNorm(c_mid, self.bn_splits, name="bn1")
        if not train:
            # eval/serving: conv1's block-diagonal matmul + bn1-apply + relu
            # all fused into the stencil kernels' tile pass — the expanded
            # c_mid tensor is never materialised in HBM.
            sc, bi = bn1(x, train, scale_bias=True, pre_matmul=wmm)
            out = fold_dw_mm_bnrelu_conv3d(x, wmm, w2.astype(x.dtype), sc,
                                           bi, c_mid, stride=self.stride,
                                           impl=self.dw_impl)
        elif self.bn_splits == 1:
            fuse = resolve_mm_train_impl(x, self.stride, self.dw_impl)
            if fuse is not None:
                # train: the whole entry (matmul + batch-stats + bn-apply +
                # relu + stencil) as one closed-form-VJP composite
                # (dw_fold4_mm_bn_train).  Compiled dispatch is opt-in —
                # measured net loss on v5e despite byte parity (PERF.md
                # round-3b); interpret mode keeps the path tested.
                out = bn1(x, train, dw_fuse=(wmm, w2.astype(x.dtype),
                                             self.stride,
                                             fuse == "interpret"))
            else:
                # bn1-apply + relu fused into the stencil kernels' tile
                # load — the normalized full-res tensor is never
                # materialised
                out = fold_matmul(x, wmm)
                sc, bi = bn1(out, train, scale_bias=True)
                out = fold_dw_bnrelu_conv3d(out, w2.astype(out.dtype), sc,
                                            bi, c_mid, stride=self.stride,
                                            impl=self.dw_impl)
        else:
            out = fold_matmul(x, wmm)
            out = nn.relu(bn1(out, train))
            out = fold_dw_conv3d(out, w2.astype(out.dtype), c_mid,
                                 stride=self.stride, impl=self.dw_impl)
        out = FoldedSubBatchNorm(c_mid, self.bn_splits, name="bn2")(out, train)

        if self.use_se:
            out = FoldedSqueezeExcite(c_mid, name="se")(out)
        out = swish(out)

        w3 = _Conv1x1Param(c_mid, c_out, name="conv3")()
        out = fold_matmul(out, fold_pointwise_kernel(
            w3, c_mid, c_out, p_in=fold_pad(c_mid)).astype(out.dtype))
        out = FoldedSubBatchNorm(c_out, self.bn_splits, name="bn3")(out, train)

        if self.has_downsample:
            wd = _Conv1x1Param(c_in, c_out, name="downsample_conv")()
            if self.stride == 1:
                residual = fold_matmul(x, fold_pointwise_kernel(
                    wd, c_in, c_out, p_in=p_in).astype(x.dtype))
            else:
                residual = fold_downsample_pw(x, wd.astype(x.dtype), c_in,
                                              c_out)
            residual = FoldedSubBatchNorm(
                c_out, self.bn_splits, name="downsample_bn")(residual, train)

        return nn.relu(out + residual)


class FoldedStage(nn.Module):
    """Residual stage in fold space (same parameters as
    :class:`..models.x3d.X3DStage` / ``_make_layer``, x3d_fine.py:277-306)."""

    in_planes: int
    mid_planes: int
    out_planes: int
    num_blocks: int
    stride: int = 2
    bn_splits: int = 1
    remat: bool = False
    dw_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        block_cls = FoldedBottleneck
        if self.remat:
            block_cls = nn.remat(FoldedBottleneck, static_argnums=(2,))
        for i in range(self.num_blocks):
            x = block_cls(
                in_planes=self.in_planes if i == 0 else self.out_planes,
                mid_planes=self.mid_planes,
                out_planes=self.out_planes,
                stride=self.stride if i == 0 else 1,
                use_se=(i % 2 == 0),
                has_downsample=(i == 0),
                bn_splits=self.bn_splits,
                dw_impl=self.dw_impl,
                name=f"block{i}",
            )(x, train)
        return x


def s2d_pack(x: jax.Array) -> jax.Array:
    """2x2 space-to-depth: ``(B, T, H, W, C) -> (B, T, H/2, W/2, 4C)`` with
    channel order ``(phase_y*2 + phase_x)*C + c`` — the input convention of
    :func:`_conv1s_fold4` with ``pre_s2d=True``.  Producers (the input
    pipeline's ``device_normalize(s2d=True)``) emit this OUTSIDE the train
    step so the step's stem reads it directly instead of paying the
    relayout-copy chain inside the hot program (PERF.md round-4)."""
    b, t, h, wd, c = x.shape
    xs = x.reshape(b, t, h // 2, 2, wd // 2, 2, c)
    return xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, h // 2, wd // 2,
                                                     4 * c)


def _conv1s_fold4(x: jax.Array, w: jax.Array, planes: int,
                  pre_s2d: bool = False) -> jax.Array:
    """conv1_s (1x3x3 / s(1,2,2), ``x3d_fine.py:210-216``) emitting fold4
    output **directly from one XLA conv** — no plain-layout intermediate and
    no pack pass.

    Input is 2x2 space-to-depth'd to ``(B, T, H/2, W/2, 4*C_in)`` (XLA fuses
    this relayout into the conv read); the canonical taps are scattered into
    a ``(1, 5, 2, 4*C_in, 4*P)`` kernel whose output features ARE the fold4
    lanes: output feature ``py*P + c`` at block row Y is original output row
    ``4Y + py``.  Output rows 4Y+py read original rows ``8Y+2py-1+dy`` =
    s2d rows ``4Y+py-1`` (phase 1, dy=0) / ``4Y+py`` (phase 0/1, dy=1/2) —
    a height-5 window at H-stride 4 with one top pad row.  Structural-zero
    pad lanes cost 4/3 extra MACs and buy a write in the exact target tiling.
    """
    if pre_s2d:
        xs = x
        c_in = x.shape[-1] // 4
    else:
        b, t, h, wd, c_in = x.shape
        xs = s2d_pack(x)
    p = fold_pad(planes)
    w2 = jnp.zeros((1, 5, 2, 4 * c_in, FOLD * p), w.dtype)
    for py in range(FOLD):
        for dy in range(3):
            k = py if dy == 0 else py + 1
            ph = 0 if dy == 1 else 1
            for dx in range(3):
                kx, q = (0, 1) if dx == 0 else (1, dx - 1)
                w2 = w2.at[0, k, kx,
                           (ph * 2 + q) * c_in:(ph * 2 + q + 1) * c_in,
                           py * p:py * p + planes].set(w[0, dy, dx])
    return jax.lax.conv_general_dilated(
        xs, w2.astype(x.dtype), (1, 4, 1), [(0, 0), (1, 0), (1, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class FoldedStem(nn.Module):
    """Stem in fold space (same parameters as :class:`..models.x3d.X3DStem`
    with ``s2d=True``): conv1_s writes fold4 directly
    (:func:`_conv1s_fold4`); conv1_t (depthwise 5x1x1) and bn1 then run in
    fold space (temporal taps are lane-aligned, so conv1_t is a plain
    lane-tiled depthwise conv)."""

    planes: int
    bn_splits: int = 1
    dw_impl: str = "auto"
    s2d_input: bool = False  # x arrives already s2d_pack'ed (B,T,H/2,W/2,4C)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        from .x3d import _Conv1sParam

        c_in = x.shape[-1] // 4 if self.s2d_input else x.shape[-1]
        c = self.planes
        p = fold_pad(c)
        w1 = _Conv1sParam(c, c_in, name="conv1_s")()
        x = _conv1s_fold4(x, w1, c, pre_s2d=self.s2d_input)
        # (B, T, H/8, W/2, 4P)

        wt = _KernelParam((5, 1, 1, 1, c), name="conv1_t")()
        wl = jnp.pad(wt.reshape(5, c), ((0, 0), (0, p - c)))
        wl = jnp.tile(wl, (1, FOLD)).reshape(5, 1, 1, 1, FOLD * p)
        x = jax.lax.conv_general_dilated(
            x, wl.astype(x.dtype), (1, 1, 1), [(2, 2), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=FOLD * p)

        x = FoldedSubBatchNorm(c, self.bn_splits, name="bn1")(x, train)
        return nn.relu(x)
