"""Pallas depthwise 3-D convolution kernels.

The X3D trunk's FLOP-light/bandwidth-heavy ops are its depthwise convs — the
stem's temporal 5×1×1 (``x3d_fine.py:216-222``) and every bottleneck's 3×3×3
(``x3d_fine.py:89-97``).  XLA's generic conv lowering runs them far from
memory speed-of-light at these shapes (C ∈ {24..432} ≪ 128 lanes); profiling
the training step shows them dominating.  These kernels:

* flatten ``(W, C)`` into the lane dimension so all 128 lanes are used even
  for C=24 (the conv never mixes W and C, and W-shifts become static slices
  at ``kw*C`` offsets within a row of a W-padded tensor);
* tile H with materialised halos (a ~(hb+2)/hb input-copy overhead) so each
  grid step is a pure VPU stencil over VMEM — the input is read from HBM
  once instead of once per tap;
* provide a custom VJP: dx reuses the same stencil with flipped taps; dw is a
  small per-tap multiply-reduce left to XLA.

Falls back to an XLA shift-and-add formulation (also one of the fast paths —
~2.5× faster than ``lax.conv`` for these shapes) on CPU, under interpret
testing, or for shapes the kernels don't cover (spatial strides).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ----------------------------------------------------------------------------
# XLA shift-and-add reference / fallback (differentiable natively)
# ----------------------------------------------------------------------------


def _shift_add_fwd_impl(x: jax.Array, w: jax.Array,
                        strides: Tuple[int, int, int]) -> jax.Array:
    """Depthwise conv as a sum of shifted elementwise products ('SAME'-style
    padding ⌊k/2⌋, matching the reference convs)."""
    kt, kh, kw, _, c = w.shape
    st, sh, sw = strides
    pt, ph, pw = kt // 2, kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (pt, pt), (ph, ph), (pw, pw), (0, 0)))
    b, tp, hp, wp, _ = xp.shape
    t_out = (x.shape[1] + 2 * pt - kt) // st + 1
    h_out = (x.shape[2] + 2 * ph - kh) // sh + 1
    w_out = (x.shape[3] + 2 * pw - kw) // sw + 1
    out = None
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                sl = jax.lax.slice(
                    xp,
                    (0, dt, dh, dw, 0),
                    (b, dt + (t_out - 1) * st + 1, dh + (h_out - 1) * sh + 1,
                     dw + (w_out - 1) * sw + 1, c),
                    (1, st, sh, sw, 1),
                )
                term = sl * w[dt, dh, dw, 0]
                out = term if out is None else out + term
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _shift_add(x, w, strides):
    return _shift_add_fwd_impl(x, w, strides)


def _sa_fwd(x, w, strides):
    return _shift_add_fwd_impl(x, w, strides), (x, w)


def _sa_bwd(strides, res, g):
    """dx as a transposed conv (dilate g, correlate with flipped taps — one
    fused pass) and dw as per-tap multiply-reduces.  The naive autodiff of the
    tap-sum materialises one padded tensor per tap and blows HBM."""
    x, w = res
    kt, kh, kw = w.shape[:3]
    st, sh, sw = strides
    pt, ph, pw = kt // 2, kh // 2, kw // 2

    # --- dx ---------------------------------------------------------------
    # dilate g by the strides, pad by (k-1-p) plus the end remainder that the
    # strided forward dropped, then stride-1 correlate with flipped taps.
    def end_extra(n_in, k, p, s):
        n_out = (n_in + 2 * p - k) // s + 1
        return n_in + 2 * p - k - (n_out - 1) * s

    cfg = [(x.shape[1], kt, pt, st), (x.shape[2], kh, ph, sh),
           (x.shape[3], kw, pw, sw)]
    pads = [(0, 0, 0)] + [
        (k - 1 - p, k - 1 - p + end_extra(n, k, p, s), s - 1)
        for (n, k, p, s) in cfg
    ] + [(0, 0, 0)]
    gd = jax.lax.pad(g, jnp.zeros((), g.dtype), pads)
    w_flip = w[::-1, ::-1, ::-1]
    dx = None
    c = x.shape[-1]
    for dt in range(kt):
        for dh in range(kh):
            for dw_ in range(kw):
                sl = jax.lax.dynamic_slice(
                    gd, (0, dt, dh, dw_, 0),
                    (g.shape[0], x.shape[1], x.shape[2], x.shape[3], c))
                term = sl * w_flip[dt, dh, dw_, 0]
                dx = term if dx is None else dx + term

    # --- dw ---------------------------------------------------------------
    # per-tap multiply-reduces would cost one full pass over x per tap (27
    # passes); XLA's kernel-grad convolution does it in one — reuse it.
    def lax_conv(ww):
        pads = [(kt // 2,) * 2, (kh // 2,) * 2, (kw // 2,) * 2]
        return jax.lax.conv_general_dilated(
            x, ww, strides, pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c)

    _, w_vjp = jax.vjp(lax_conv, w)
    (dw,) = w_vjp(g)
    return dx, dw


_shift_add.defvjp(_sa_fwd, _sa_bwd)


# ----------------------------------------------------------------------------
# Pallas kernels (stride-1 only)
# ----------------------------------------------------------------------------


def _pick_tiles(t: int, h: int, pt: int, ph: int, wc: int) -> Tuple[int, int]:
    """Pick (tb, hb) tile sizes: sublanes (hb) filled to >=8, block working set
    (input in f32 + accumulator + a rolled copy, double-buffered I/O) within
    a conservative VMEM budget."""
    budget = 2 * 1024 * 1024  # f32 input-block budget
    def ok(tb, hb):
        return (tb + 2 * pt) * (hb + 2 * ph) * wc * 4 <= budget
    hbs = [d for d in range(1, h + 1) if h % d == 0]
    tbs = [d for d in range(1, t + 1) if t % d == 0]
    best = (tbs[0], hbs[0])
    best_score = -1.0
    for hb in hbs:
        for tb in tbs:
            if not ok(tb, hb):
                continue
            # prefer sublane fill (hb>=16), then low halo overhead
            fill = min(hb, 16) / 16.0
            halo = (tb / (tb + 2 * pt)) * (hb / (hb + 2 * ph))
            score = fill * 10 + halo + 0.001 * tb
            if score > best_score:
                best_score = score
                best = (tb, hb)
    return best


def _dw_pallas_raw(x: jax.Array, w: jax.Array, interpret: bool = False
                   ) -> jax.Array:
    """Stride-1 depthwise conv, SAME padding.  x: (B,T,H,W,C); w: (KT,KH,KW,1,C)."""
    b, t, h, w_sp, c = x.shape
    kt, kh, kw = w.shape[:3]
    pt, ph, pw = kt // 2, kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (pt, pt), (ph, ph), (pw, pw), (0, 0)))
    wp_sp = w_sp + 2 * pw

    # lane-flatten (W, C); tile the per-C taps across W
    xf = xp.reshape(b, t + 2 * pt, h + 2 * ph, wp_sp * c)
    wf = jnp.tile(w.reshape(kt * kh * kw, c), (1, w_sp)).astype(jnp.float32)

    tb, hb = _pick_tiles(t, h, pt, ph, wp_sp * c)
    n_t, n_h = t // tb, h // hb

    # materialise T/H halos (overlapping windows aren't expressible with
    # block-aligned BlockSpecs): ~(tb+2pt)/tb · (hb+2ph)/hb input-copy cost
    if n_t > 1 and pt:
        idx_t = (jnp.arange(n_t)[:, None] * tb
                 + jnp.arange(tb + 2 * pt)[None, :]).reshape(-1)
        xf = jnp.take(xf, idx_t, axis=1)
    xf = xf.reshape(b, n_t, (tb + 2 * pt) if (n_t > 1 and pt) else
                    (tb + 2 * pt if n_t == 1 else tb), h + 2 * ph, wp_sp * c)
    if n_h > 1 and ph:
        idx_h = (jnp.arange(n_h)[:, None] * hb
                 + jnp.arange(hb + 2 * ph)[None, :]).reshape(-1)
        xf = jnp.take(xf, idx_h, axis=3)
    xf = xf.reshape(b, n_t, tb + 2 * pt, n_h,
                    (hb + 2 * ph) if (n_h > 1 and ph) else (hb + 2 * ph if n_h == 1 else hb),
                    wp_sp * c)

    kern = functools.partial(_stencil_kernel, kt=kt, kh=kh, kw=kw, t_out=tb,
                             hb=hb, w_out=w_sp, c=c)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n_t, tb, n_h, hb, w_sp * c),
                                       x.dtype),
        grid=(b, n_t, n_h),
        in_specs=[
            pl.BlockSpec((1, 1, tb + 2 * pt, 1, hb + 2 * ph, wp_sp * c),
                         lambda bi, ti, hi: (bi, ti, 0, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt * kh * kw, w_sp * c),
                         lambda bi, ti, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tb, 1, hb, w_sp * c),
                               lambda bi, ti, hi: (bi, ti, 0, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, wf)
    return (out.transpose(0, 1, 2, 3, 4, 5)
               .reshape(b, t, h, w_sp, c))


def _stencil_kernel(x_ref, w_ref, o_ref, *, kt, kh, kw, t_out, hb, w_out, c):
    """One (T,H)-tile stencil over lane-flattened (W, C):
    ``out[t,h,:] = Σ_taps w[tap] · x[t+dt, h+dh, shifted by dw·c lanes]``.

    W-shifts are lane rolls (arbitrary-lane slices would force Mosaic
    relayouts); the wrapped lanes land beyond ``w_out·c`` and are cropped by
    the output slice.  The block is converted to f32 once (Mosaic lacks
    non-32-bit lane rotates) and accumulated in f32.

    x_ref: ``(1, 1, t_out+kt-1, 1, hb+kh-1, (w_out+kw-1)*c)``
    w_ref: ``(kt*kh*kw, w_out*c)`` f32 per-tap weights tiled across W
    o_ref: ``(1, 1, t_out, 1, hb, w_out*c)``
    """
    wc = w_out * c
    xv = x_ref[0, 0, :, 0].astype(jnp.float32)  # (t+2pt, hb+2ph, WpC)
    n_lanes = xv.shape[2]
    acc = None
    for dw in range(kw):
        # left-roll by dw*c == non-negative roll by (n - dw*c)
        xs = pltpu.roll(xv, shift=n_lanes - dw * c, axis=2) if dw else xv
        for dt in range(kt):
            for dh in range(kh):
                tap = (dt * kh + dh) * kw + dw
                sl = xs[dt:dt + t_out, dh:dh + hb, 0:wc]
                term = sl * w_ref[tap][None, None, :]
                acc = term if acc is None else acc + term
    o_ref[0, 0, :, 0] = acc.astype(o_ref.dtype)


def dw_conv_supported(x_shape, w_shape, strides) -> bool:
    """Pallas path covers stride-1 SAME depthwise convs with odd kernels."""
    kt, kh, kw = w_shape[:3]
    return (
        tuple(strides) == (1, 1, 1)
        and kt % 2 == 1 and kh % 2 == 1 and kw % 2 == 1
        and (kh == kw)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw_pallas(x, w, interpret=False):
    return _dw_pallas_raw(x, w, interpret)


def _dw_fwd(x, w, interpret):
    return _dw_pallas_raw(x, w, interpret), (x, w)


def _dw_bwd(interpret, res, g):
    x, w = res
    kt, kh, kw = w.shape[:3]
    c = w.shape[4]
    # dx: correlate g with tap-flipped weights — the same stencil
    w_flip = w[::-1, ::-1, ::-1]
    dx = _dw_pallas_raw(g, w_flip, interpret)
    # dw: per-tap multiply-reduce, left to XLA (few fused passes)
    pt, ph, pw = kt // 2, kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (pt, pt), (ph, ph), (pw, pw), (0, 0)))
    t, h, w_sp = x.shape[1:4]
    taps = []
    for dt in range(kt):
        for dh in range(kh):
            for dw_ in range(kw):
                sl = xp[:, dt:dt + t, dh:dh + h, dw_:dw_ + w_sp]
                taps.append(jnp.sum(
                    (sl * g).astype(jnp.float32), axis=(0, 1, 2, 3)))
    dw = jnp.stack(taps).reshape(kt, kh, kw, 1, c).astype(w.dtype)
    return dx, dw


_dw_pallas.defvjp(_dw_fwd, _dw_bwd)


def _lax_conv(x, w, strides):
    pads = [(k // 2, k // 2) for k in w.shape[:3]]
    return jax.lax.conv_general_dilated(
        x, w, strides, pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lax_fast_wgrad(x, w, strides):
    return _lax_conv(x, w, strides)


def _lfw_fwd(x, w, strides):
    return _lax_conv(x, w, strides), (x, w)


def _lfw_bwd(strides, res, g):
    """Forward and dx stay on XLA's conv primitives (their lowering is good);
    only the weight gradient is replaced — XLA's depthwise kernel-grad conv
    measures ~3× slower than a per-tap multiply-reduce at few-tap shapes."""
    x, w = res
    _, x_vjp = jax.vjp(lambda a: _lax_conv(a, w, strides), x)
    (dx,) = x_vjp(g)
    kt, kh, kw = w.shape[:3]
    st, sh, sw = strides
    c = x.shape[-1]
    pt, ph, pw = kt // 2, kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (pt, pt), (ph, ph), (pw, pw), (0, 0)))
    taps = []
    for dt in range(kt):
        for dh in range(kh):
            for dw_ in range(kw):
                sl = jax.lax.slice(
                    xp, (0, dt, dh, dw_, 0),
                    (x.shape[0], dt + (g.shape[1] - 1) * st + 1,
                     dh + (g.shape[2] - 1) * sh + 1,
                     dw_ + (g.shape[3] - 1) * sw + 1, c),
                    (1, st, sh, sw, 1))
                taps.append(jnp.sum((sl * g).astype(jnp.float32),
                                    axis=(0, 1, 2, 3)))
    dw = jnp.stack(taps).reshape(kt, kh, kw, 1, c).astype(w.dtype)
    return dx, dw


_lax_fast_wgrad.defvjp(_lfw_fwd, _lfw_bwd)


def depthwise_conv3d(
    x: jax.Array,
    w: jax.Array,
    strides: Tuple[int, int, int] = (1, 1, 1),
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """Depthwise 3-D conv, channels-last, SAME-⌊k/2⌋ padding.

    Args:
      x: ``(B, T, H, W, C)``.
      w: ``(KT, KH, KW, 1, C)`` (flax depthwise kernel layout — checkpoint
        compatible).
      impl: ``auto`` (pallas on TPU where supported, else shift-add) |
        ``pallas`` | ``shift_add`` | ``lax``.
    """
    if impl == "lax":
        return _lax_conv(x, w, strides)
    if impl == "lax_fast_wgrad":
        # manual per-tap weight grad: wins in isolation (XLA's depthwise
        # kernel-grad is ~3× slower standalone) but loses in-model, where the
        # fused dx+dw backward shares work — kept as a measured option
        return _lax_fast_wgrad(x, w, tuple(strides))
    use_pallas = impl == "pallas" or (
        impl == "auto"
        and jax.default_backend() == "tpu"
        and dw_conv_supported(x.shape, w.shape, strides)
    )
    if use_pallas:
        return _dw_pallas(x, w, interpret)
    kt, kh, kw = w.shape[:3]
    if tuple(strides) == (1, 1, 1) and kh == 1 and kw == 1:
        # temporal-only stencil: all shifted slices are tile-aligned along T,
        # so the fused shift-add beats the generic conv (~2.5x measured).
        # Spatial shifts would be lane-misaligned (C < 128 is the minor dim)
        # and lower to relayout copies — the generic conv wins there.
        return _shift_add(x, w, strides)
    pads = [(k // 2, k // 2) for k in w.shape[:3]]
    return jax.lax.conv_general_dilated(
        x, w, strides, pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1])
