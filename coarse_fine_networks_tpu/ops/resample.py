"""Differentiable 1-D temporal resampling as MXU-friendly matmuls.

The reference implements three flavours of temporal resampling:

* learned-grid pooling via 5-D trilinear ``F.grid_sample`` with identity H/W
  grids (``x3d_coarse.py:394-403``),
* inverse-CDF evaluation via a custom ``searchsorted``-based autograd Function
  (``interp1d.py:4-162`` used at ``x3d_coarse.py:435-438``),
* uniform ``F.interpolate(mode='linear')`` with and without ``align_corners``
  (``x3d_coarse.py:725``, ``train_fine.py:199``, ``train_coarse_fineFEAT.py:226``).

All three are linear maps along the temporal axis.  On TPU we express each as a
small dense "hat matrix" ``W[t, k]`` (source-frame × output-knot interpolation
weights) and contract it with the feature tensor on the MXU.  This is exact
(linear interpolation *is* a two-tap hat filter), trivially differentiable in
both the features and the sampling positions, and avoids gather/scatter which
the VPU handles poorly.  Out-of-range taps get zero weight, which reproduces
``grid_sample``'s ``padding_mode='zeros'`` behaviour exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# torch.finfo(torch.float32).eps — used by the reference's interp1d slope
# denominator (interp1d.py:37,136).
_F32_EPS = float(jnp.finfo(jnp.float32).eps)

# Interpolation weights are two-tap and numerically sensitive (checkpoint
# parity); force full-f32 contractions — the FLOPs here are negligible.
_EXACT = jax.lax.Precision.HIGHEST


def hat_matrix(positions: jax.Array, length: int) -> jax.Array:
    """Linear-interpolation weight matrix.

    Args:
      positions: ``(..., K)`` sampling positions in source-index units
        (``0 .. length-1``).  May be batched and may depend on learned values
        (gradients flow through).
      length: number of source frames ``T``.

    Returns:
      ``(..., T, K)`` weights such that
      ``out[..., k] = sum_t W[..., t, k] * x[..., t]`` equals linear
      interpolation of ``x`` at ``positions[..., k]`` with zero padding
      outside ``[0, T-1]`` (matching ``F.grid_sample(align_corners=True,
      padding_mode='zeros')`` after the reference's ``(g-0.5)*2`` coordinate
      mapping, ``x3d_coarse.py:394-403``).
    """
    t = jnp.arange(length, dtype=positions.dtype)
    d = 1.0 - jnp.abs(positions[..., None, :] - t[:, None])
    return jnp.maximum(d, 0.0)


def temporal_resample(x: jax.Array, positions: jax.Array) -> jax.Array:
    """Resample ``x`` along its temporal axis at per-batch positions.

    Args:
      x: ``(B, T, ...)`` features (channels-last; trailing dims arbitrary).
      positions: ``(B, K)`` sampling positions in ``[0, T-1]`` units.

    Returns:
      ``(B, K, ...)`` resampled features.

    Equivalent to the reference's temporal-only trilinear ``F.grid_sample``
    (``x3d_coarse.py:394-403``, ``x3d_coarse.py:442-445``) — the H/W grids
    there are identity, so only the T axis is actually resampled.
    """
    b, t = x.shape[0], x.shape[1]
    w = hat_matrix(positions, t)  # (B, T, K)
    xf = x.reshape(b, t, -1)
    out = jnp.einsum("btm,btk->bkm", xf, w, precision=_EXACT,
                     preferred_element_type=xf.dtype)
    return out.reshape((b, positions.shape[-1]) + x.shape[2:])


def _resize_positions(in_len: int, out_len: int, align_corners: bool,
                      dtype=jnp.float32) -> jax.Array:
    """Source positions used by ``F.interpolate(mode='linear')``."""
    j = jnp.arange(out_len, dtype=dtype)
    if align_corners:
        if out_len == 1:
            return jnp.zeros((1,), dtype)
        return j * ((in_len - 1) / (out_len - 1))
    # half-pixel convention; torch clamps the source position at 0 and the
    # upper gather index at in_len-1, which a clip to [0, in_len-1] reproduces.
    pos = (j + 0.5) * (in_len / out_len) - 0.5
    return jnp.clip(pos, 0.0, float(in_len - 1))


def linear_resize(x: jax.Array, out_len: int, align_corners: bool = True) -> jax.Array:
    """``F.interpolate(x, out_len, mode='linear')`` along axis 1.

    Args:
      x: ``(B, T, ...)``.
      align_corners: ``True`` matches ``train_fine.py:199`` /
        ``x3d_coarse.py:725``; ``False`` matches the coarse driver's
        ``F.interpolate`` which omits the flag (``train_coarse_fineFEAT.py:226``).
    """
    b, t = x.shape[0], x.shape[1]
    pos = _resize_positions(t, out_len, align_corners, x.dtype)
    w = hat_matrix(pos, t)  # (T, K)
    xf = x.reshape(b, t, -1)
    out = jnp.einsum("btm,tk->bkm", xf, w, precision=_EXACT,
                     preferred_element_type=xf.dtype)
    return out.reshape((b, out_len) + x.shape[2:])


def inverse_cdf(knots: jax.Array, num_out: int | None = None) -> jax.Array:
    """Numerically invert a batched monotone CDF by linear interpolation.

    Given CDF knot values ``knots`` of shape ``(B, K)`` (monotone, typically
    ``knots[:,0]==0`` and ``knots[:,-1]==1``) sampled at uniform abscissae
    ``u_i = i/(K-1)``, returns the inverse CDF evaluated at uniform query
    points ``u_j = j/(num_out-1)``.

    Mirrors ``Interp1d()(gx, mid, mid)`` from the reference
    (``x3d_coarse.py:435-438`` + ``interp1d.py:100-141``): ``searchsorted``
    indices are non-differentiable constants; gradients flow through the
    gathered knot values and the slope — exactly what the reference's
    re-run-autograd backward computes, but native in JAX.
    """
    b, k = knots.shape
    if num_out is None:
        num_out = k
    u = jnp.linspace(0.0, 1.0, num_out, dtype=knots.dtype)
    # searchsorted(left) per batch row, then shift to the left-neighbour index
    # and clamp to a valid segment (interp1d.py:100-110).
    ind = jax.vmap(lambda kn: jnp.searchsorted(kn, u, side="left"))(knots)
    ind = jnp.clip(ind - 1, 0, k - 2)
    x0 = jnp.take_along_axis(knots, ind, axis=1)
    x1 = jnp.take_along_axis(knots, ind + 1, axis=1)
    # y values are the uniform abscissae of the knots.
    y0 = ind.astype(knots.dtype) / (k - 1)
    y1 = (ind + 1).astype(knots.dtype) / (k - 1)
    slope = (y1 - y0) / (_F32_EPS + (x1 - x0))
    return y0 + slope * (u[None, :] - x0)


def interp1d(x: jax.Array, y: jax.Array, xnew: jax.Array) -> jax.Array:
    """General batched linear 1-D interpolation (API parity with the
    reference's ``Interp1d`` utility, ``interp1d.py:4-162``).

    Args:
      x: ``(B, N)`` monotonically increasing sample abscissae.
      y: ``(B, N)`` sample values.
      xnew: ``(B, P)`` query points.

    Returns:
      ``(B, P)`` linearly interpolated (and, outside the support, linearly
      extrapolated from the edge segment — matching the reference).

    Unlike the reference, gradients to all three inputs come from plain JAX
    autodiff of the gather+lerp — no re-run-autograd backward needed.
    """
    n = x.shape[1]
    ind = jax.vmap(lambda xi, qi: jnp.searchsorted(xi, qi, side="left"))(x, xnew)
    ind = jnp.clip(ind - 1, 0, n - 2)
    x0 = jnp.take_along_axis(x, ind, axis=1)
    x1 = jnp.take_along_axis(x, ind + 1, axis=1)
    y0 = jnp.take_along_axis(y, ind, axis=1)
    y1 = jnp.take_along_axis(y, ind + 1, axis=1)
    slope = (y1 - y0) / (_F32_EPS + (x1 - x0))
    return y0 + slope * (xnew - x0)
