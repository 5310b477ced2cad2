"""X3D trunk building blocks, channels-last (B, T, H, W, C).

Structure mirrors the reference X3D-M backbone (``x3d_fine.py:108-405``,
duplicated at ``x3d_coarse.py:106-172``): stem = spatial 1×3×3/s(1,2,2) conv +
depthwise temporal 5×1×1 conv; four stages of bottlenecks with depthwise 3³
convs, SE on even blocks, Swish; head conv5 + bn5.

Depthwise 3-D convs go through :class:`DepthwiseConv` (pluggable generic /
shift-and-add / Pallas implementations); pointwise 1×1×1 convs are matmuls on
the MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas.dw_conv import depthwise_conv3d
from .layers import (SubBatchNorm, SqueezeExcite, kaiming_normal,
                     round_width, swish)


class DepthwiseConv(nn.Module):
    """Depthwise 3-D conv with a pluggable implementation
    (:mod:`..ops.pallas.dw_conv`): generic ``lax`` conv (default — in-model
    XLA fuses it with surrounding elementwise ops and wins end-to-end),
    XLA shift-and-add, or the Pallas stencil kernel (both measured ~2.5×
    faster *standalone* but losing those fusions in the full step; kept as
    options for further kernel work).

    Parameter layout matches ``flax.linen.Conv`` with
    ``feature_group_count=C`` (kernel ``(D, H, W, 1, C)``), so checkpoints
    and the torch converter are unaffected.
    """

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    impl: str = "lax"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", kaiming_normal,
            self.kernel_size + (1, self.features), jnp.float32,
        )
        return depthwise_conv3d(x, kernel.astype(x.dtype), self.strides,
                                impl=self.impl)


def get_inplanes(version: str) -> list[Tuple[int, int]]:
    """(mid, out) channel table per stage (x3d_fine.py:388-393)."""
    planes = {
        "S": [(54, 24), (108, 48), (216, 96), (432, 192)],
        "M": [(54, 24), (108, 48), (216, 96), (432, 192)],
        "XL": [(72, 32), (162, 72), (306, 136), (630, 280)],
    }
    return planes[version]


def get_blocks(version: str) -> list[int]:
    """Blocks per stage (x3d_fine.py:395-400)."""
    blocks = {"S": [3, 5, 11, 7], "M": [3, 5, 11, 7], "XL": [5, 10, 25, 15]}
    return blocks[version]




def _s2d(x: jax.Array) -> jax.Array:
    """2×2 space-to-depth: (B,T,H,W,C) → (B,T,H/2,W/2,4C), channel order
    ((p*2+q)*C + c)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, h // 2, w // 2,
                                                    4 * c)


def _d2s(x: jax.Array, c_out: int) -> jax.Array:
    """Inverse of :func:`_s2d`."""
    b, t, h2, w2, _ = x.shape
    x = x.reshape(b, t, h2, w2, 2, 2, c_out)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, h2 * 2, w2 * 2,
                                                    c_out)


def _pad_width(width: int, multiple: int) -> int:
    """Round ``width`` up to a multiple (tensor-parallel channel padding)."""
    return -(-width // multiple) * multiple


class Bottleneck(nn.Module):
    """X3D bottleneck (x3d_fine.py:108-175): 1×1×1 expand → depthwise 3³
    (+stride) → SE (even index) → Swish → 1×1×1 project → residual + ReLU.

    ``channel_pad > 1`` rounds the mid (expansion) width up to that multiple
    so every channel-sharded dimension of the tensor-parallel tower divides
    the ``model`` mesh axis (parallel/tensor.py).  Zero-filled padded
    parameters make the extra channels exactly inert: conv1's zero columns
    emit zero activations, BN with scale=bias=mean=0/var=1 maps 0→0, the
    depthwise conv and Swish preserve zeros, the SE gate multiplies a zero
    activation, and conv3's zero rows contribute nothing to the projection.
    The SE squeeze width stays ``round_width(mid_planes)`` of the *original*
    mid so fc1/fc2 shapes match the unpadded checkpoint up to zero blocks.
    """

    mid_planes: int
    out_planes: int
    stride: int = 1
    use_se: bool = False
    has_downsample: bool = False
    t_downsample: bool = False  # fine-only: stride T too (x3d_fine.py:93)
    bn_splits: int = 1
    dw_impl: str = "lax"
    fold_pw: bool = False  # run conv1 in 2×2 space-to-depth space (exact;
    # K=4·C_in feeds the MXU better than tiny C_in at high resolution)
    channel_pad: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        s = self.stride
        strides = (s, s, s) if self.t_downsample else (1, s, s)
        residual = x
        mid_p = _pad_width(self.mid_planes, self.channel_pad)

        if self.fold_pw and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0:
            w1 = _Conv1x1Param(x.shape[-1], mid_p, name="conv1")()
            c_in, c_mid = x.shape[-1], mid_p
            # block-diagonal expansion: out_s2d[(pq,c')] = Σ_c W[c,c']·x[(pq,c)]
            wbd = jnp.zeros((4 * c_in, 4 * c_mid), w1.dtype)
            for pq in range(4):
                wbd = wbd.at[pq * c_in:(pq + 1) * c_in,
                             pq * c_mid:(pq + 1) * c_mid].set(w1[0, 0, 0])
            xs = _s2d(x)
            out = jax.lax.dot_general(
                xs, wbd.astype(x.dtype),
                (((4,), (0,)), ((), ())),
                preferred_element_type=x.dtype)
            out = _d2s(out, c_mid)
        else:
            out = nn.Conv(mid_p, (1, 1, 1), use_bias=False,
                          name="conv1", kernel_init=kaiming_normal,
                          dtype=x.dtype)(x)
        out = SubBatchNorm(mid_p, self.bn_splits, name="bn1")(out, train)
        out = nn.relu(out)

        out = DepthwiseConv(mid_p, (3, 3, 3), strides=strides,
                            impl=self.dw_impl, name="conv2")(out)
        out = SubBatchNorm(mid_p, self.bn_splits, name="bn2")(out, train)

        if self.use_se:
            out = SqueezeExcite(mid_p, width=round_width(self.mid_planes),
                                name="se")(out)
        out = swish(out)

        out = nn.Conv(self.out_planes, (1, 1, 1), use_bias=False, name="conv3",
                      kernel_init=kaiming_normal, dtype=x.dtype)(out)
        out = SubBatchNorm(self.out_planes, self.bn_splits, name="bn3")(out, train)

        if self.has_downsample:
            residual = nn.Conv(
                self.out_planes, (1, 1, 1), strides=strides, use_bias=False,
                name="downsample_conv", kernel_init=kaiming_normal, dtype=x.dtype,
            )(x)
            residual = SubBatchNorm(
                self.out_planes, self.bn_splits, name="downsample_bn"
            )(residual, train)

        return nn.relu(out + residual)


class X3DStage(nn.Module):
    """A residual stage (``_make_layer``, x3d_fine.py:277-306).

    The SE flag alternates with a per-stage-resetting block index
    (``self.index = 0`` at x3d_fine.py:305 makes even-indexed blocks within
    each stage carry SE).
    """

    mid_planes: int
    out_planes: int
    num_blocks: int
    stride: int = 2
    t_downsample: bool = False
    bn_splits: int = 1
    remat: bool = False
    dw_impl: str = "lax"
    fold_pw: bool = False
    channel_pad: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        block_cls = Bottleneck
        if self.remat:
            block_cls = nn.remat(Bottleneck, static_argnums=(2,))
        for i in range(self.num_blocks):
            x = block_cls(
                mid_planes=self.mid_planes,
                out_planes=self.out_planes,
                stride=self.stride if i == 0 else 1,
                use_se=(i % 2 == 0),
                has_downsample=(i == 0),
                t_downsample=self.t_downsample,
                bn_splits=self.bn_splits,
                dw_impl=self.dw_impl,
                fold_pw=self.fold_pw and i == 0,
                channel_pad=self.channel_pad,
                name=f"block{i}",
            )(x, train)
        return x


class X3DStem(nn.Module):
    """Stem: spatial conv1_s + depthwise temporal conv1_t + bn1 + relu
    (x3d_fine.py:210-224).

    ``s2d=True`` applies the classic TPU space-to-depth transform to the
    first conv: the 3-channel (1,3,3)/s(1,2,2) conv becomes an exactly
    equivalent (1,2,2)/s(1,1,1) conv over a 2×2-block-folded 12-channel
    input, with the stored kernel rearranged at apply time — checkpoints are
    unaffected and gradients flow to the original parameter.
    """

    planes: int
    bn_splits: int = 1
    dw_impl: str = "lax"
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.s2d and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0:
            x = _s2d_conv1_s(x, self, x.shape[-1])
        else:
            x = nn.Conv(
                self.planes, (1, 3, 3), strides=(1, 2, 2), padding=(0, 1, 1),
                use_bias=False, name="conv1_s", kernel_init=kaiming_normal,
                dtype=x.dtype,
            )(x)
        x = DepthwiseConv(self.planes, (5, 1, 1), impl=self.dw_impl,
                          name="conv1_t")(x)
        x = SubBatchNorm(self.planes, self.bn_splits, name="bn1")(x, train)
        return nn.relu(x)


class _Conv1x1Param(nn.Module):
    """Canonical 1×1×1 conv kernel parameter (checkpoint layout
    (1,1,1,C_in,C_out)) for the folded pointwise path."""

    c_in: int
    c_out: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_normal,
                          (1, 1, 1, self.c_in, self.c_out), jnp.float32)


class _Conv1sParam(nn.Module):
    """Holder exposing the canonical conv1_s kernel parameter (checkpoint
    layout (1,3,3,C_in,planes)) for the space-to-depth path."""

    planes: int
    c_in: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_normal,
                          (1, 3, 3, self.c_in, self.planes), jnp.float32)


def _s2d_conv1_s(x: jax.Array, stem: "X3DStem", c_in: int) -> jax.Array:
    """Space-to-depth-equivalent first conv (see X3DStem docstring).

    For output row y, the source rows 2y-1..2y+1 live in s2d blocks
    {y-1 (phase 1), y (phases 0,1)} — a 2-tap kernel over blocks with the
    original taps scattered into (phase, channel) slots; zero-padding one
    block on the top/left reproduces the original SAME padding.
    """
    w = _Conv1sParam(stem.planes, c_in, name="conv1_s")()
    b, t, h, wd, _ = x.shape
    xs = x.reshape(b, t, h // 2, 2, wd // 2, 2, c_in)
    xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        b, t, h // 2, wd // 2, 4 * c_in)

    # scatter original taps w[0, dy, dx, c, o] into the (1,2,2,4c,o) kernel
    w2 = jnp.zeros((1, 2, 2, 4 * c_in, stem.planes), w.dtype)
    for dy in range(3):
        k, p = (0, 1) if dy == 0 else (1, dy - 1)
        for dx in range(3):
            kx, q = (0, 1) if dx == 0 else (1, dx - 1)
            w2 = w2.at[0, k, kx,
                       (p * 2 + q) * c_in:(p * 2 + q) * c_in + c_in].set(
                w[0, dy, dx])
    return jax.lax.conv_general_dilated(
        xs, w2.astype(x.dtype), (1, 1, 1), [(0, 0), (1, 0), (1, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class X3DHead(nn.Module):
    """conv5 + bn5 + relu (x3d_fine.py:245-251).

    ``channel_pad > 1`` widens conv5/bn5 like :class:`Bottleneck` — the
    caller (``FineNet``) slices the public feature surfaces back to
    ``out_planes``; the logits path consumes the padded width directly
    (fc1's zero-padded contraction rows are exact)."""

    out_planes: int
    bn_splits: int = 1
    channel_pad: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        out_p = _pad_width(self.out_planes, self.channel_pad)
        x = nn.Conv(out_p, (1, 1, 1), use_bias=False, name="conv5",
                    kernel_init=kaiming_normal, dtype=x.dtype)(x)
        x = SubBatchNorm(out_p, self.bn_splits, name="bn5")(x, train)
        return nn.relu(x)
