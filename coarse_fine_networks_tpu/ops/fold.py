"""Row-fold ("fold4") tensor layout for small-channel TPU stages.

Why this exists: XLA lays convolution buffers out channels-minor with the
lane dimension tiled to 128, so the X3D stem/layer1 stream (C = 3/24/54)
pays a 2.4-10.7x physical-memory tax on every pass — measured 78 GB moved
for ~15 GB logical in the coarse train step (PERF.md).  Folding 4 adjacent
rows into the channel dimension fills the lanes: C=24 becomes 128 lanes,
C=54 becomes 256, and the same convolutions move 2-4x fewer bytes.

Layout definition (``fold4``): a plain ``(B, T, H, W, C)`` tensor becomes

    x_fold[b, t, Y, w, py*P + c] = x[b, t, 4*Y + py, w, c]

with ``P = fold_pad(C)`` (next multiple of 32) and zeros in the pad lanes
``c >= C``.  Rows are grouped along H ("y-phases" ``py in 0..3``); W stays
spatial so depthwise stencils keep W-neighbours in the sublane dimension.

All transforms here are exact relayouts/parameter rearrangements of the
reference ops (``x3d_fine.py:89-175``); checkpoints are unaffected — folded
modules consume the canonical parameters and rearrange at apply time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FOLD = 4


def fold_pad(c: int) -> int:
    """Per-phase padded channel count: next multiple of 32."""
    return ((c + 31) // 32) * 32


def to_fold4(x: jax.Array, P: int | None = None) -> jax.Array:
    """(B,T,H,W,C) → (B,T,H/4,W,4P)."""
    b, t, h, w, c = x.shape
    assert h % FOLD == 0, (h,)
    P = fold_pad(c) if P is None else P
    x = x.reshape(b, t, h // FOLD, FOLD, w, c)
    x = jnp.moveaxis(x, 3, 4)  # (b,t,H',w,4,c)
    if P > c:
        x = jnp.pad(x, [(0, 0)] * 5 + [(0, P - c)])
    return x.reshape(b, t, h // FOLD, w, FOLD * P)


def from_fold4(x: jax.Array, c: int) -> jax.Array:
    """(B,T,H/4,W,4P) → (B,T,H,W,C)."""
    b, t, hp, w, l = x.shape
    P = l // FOLD
    x = x.reshape(b, t, hp, w, FOLD, P)[..., :c]
    x = jnp.moveaxis(x, 4, 3)
    return x.reshape(b, t, hp * FOLD, w, c)


def fold_pointwise_kernel(w: jax.Array, c_in: int, c_out: int,
                          p_in: int | None = None,
                          p_out: int | None = None) -> jax.Array:
    """Canonical 1x1x1 kernel (1,1,1,C_in,C_out) → block-diagonal
    (4*P_in, 4*P_out) matrix acting on fold4 lanes (phase-preserving)."""
    p_in = fold_pad(c_in) if p_in is None else p_in
    p_out = fold_pad(c_out) if p_out is None else p_out
    w2 = w.reshape(c_in, c_out)
    wp = jnp.zeros((p_in, p_out), w.dtype).at[:c_in, :c_out].set(w2)
    out = jnp.zeros((FOLD * p_in, FOLD * p_out), w.dtype)
    for p in range(FOLD):
        out = out.at[p * p_in:(p + 1) * p_in,
                     p * p_out:(p + 1) * p_out].set(wp)
    return out


def fold_matmul(x: jax.Array, w_fold: jax.Array) -> jax.Array:
    """Apply a folded pointwise kernel: (…,4P_in) @ (4P_in,4P_out)."""
    s = x.shape
    y = x.reshape(-1, s[-1]) @ w_fold.astype(x.dtype)
    return y.reshape(*s[:-1], w_fold.shape[1])


def pad_vec(v: jax.Array, c: int, P: int, fill: float = 0.0) -> jax.Array:
    """(C,) per-channel vector → (4P,) per-lane vector, pad lanes = fill."""
    vp = jnp.full((P,), fill, v.dtype).at[:c].set(v.reshape(-1))
    return jnp.tile(vp, FOLD)


def phase_mean(x: jax.Array, P: int, axes) -> jax.Array:
    """Mean over the given axes AND the 4 phases: (…,4P) → (…,P) stats."""
    m = jnp.mean(x, axis=axes)  # (..., 4P)
    return m.reshape(*m.shape[:-1], FOLD, P).mean(axis=-2)


def refold_y2_to_y4(x: jax.Array) -> jax.Array:
    """(B,T,H2,W,2,P)-as-(…,2P)? No — takes (B,T,Hb,2,W,P) row-pairs and
    regroups consecutive block pairs into fold4: rows (Hb*2) → (Hb/2, 4).

    Used by the fold-space stride-2 downsample, whose natural output is
    y-fold2 (row pairs)."""
    b, t, hb, two, w, p = x.shape
    assert two == 2 and hb % 2 == 0
    x = x.reshape(b, t, hb // 2, 2, 2, w, p)       # (.., Y, bp, ph, w, P)
    x = x.reshape(b, t, hb // 2, 4, w, p)          # rows in order ✓
    x = jnp.moveaxis(x, 3, 4)                      # (.., Y, w, 4, P)
    return x.reshape(b, t, hb // 2, w, 4 * p)


def fold_downsample_kernel(w: jax.Array, c_in: int, c_out: int,
                           p_in: int | None = None,
                           p_out: int | None = None) -> jax.Array:
    """Canonical 1x1x1 kernel ``(..., C_in, C_out)`` → ``(1, 2, 1, 4*P_in,
    4*P_out)`` kernel for the stride-(1,2,2) pointwise conv **consuming fold4
    rows directly** (the residual downsample of ``x3d_fine.py:144-149``).

    Output block row Z', phase p' is plain row ``4Z'+p'``, which reads plain
    input row ``8Z'+2p'`` = input block ``2Z' + p'//2``, phase ``2*(p' % 2)``
    — a height-2 window over the *block* axis at stride 2, with the phase
    routing scattered into the lane slots, and even W columns via W-stride 2.
    One strided lax conv in the standard fold4 layout replaces the previous
    strided-slice → refold → matmul chain, whose non-minor strided slice
    forced XLA into a T-minor relayout + gather forward and a broadcast +
    scatter-add + two relayout copies backward (~9 ms of the profiled train
    step; PERF.md round-3e)."""
    p_in = fold_pad(c_in) if p_in is None else p_in
    p_out = fold_pad(c_out) if p_out is None else p_out
    w2 = w.reshape(c_in, c_out)
    k = jnp.zeros((1, 2, 1, FOLD * p_in, FOLD * p_out), w.dtype)
    for pp in range(FOLD):
        kb, ph_in = pp // 2, 2 * (pp % 2)
        k = k.at[0, kb, 0,
                 ph_in * p_in:ph_in * p_in + c_in,
                 pp * p_out:pp * p_out + c_out].set(w2)
    return k


def fold_gridpool_conv1_kernel(w: jax.Array, c_in: int, c_out: int,
                               p_in: int | None = None) -> jax.Array:
    """Canonical 3x3x3 stride-(·,2,2) pad-1 kernel ``(3,3,3,C_in,C_out)`` →
    ``(3, 2, 3, 4*P_in, 2*C_out)`` kernel consuming fold4 rows directly.

    Output row ``m = 2Z + j`` (fold4 block Z, parity j) of the plain strided
    conv reads plain rows ``4Z + 2j - 1 + dy``; as a conv over the *block*
    axis (stride 1, one top pad block) that is kernel-height-2 with the dy
    taps scattered into (block-offset, y-phase) lane slots, and the two j
    parities emitted as paired output features (row-pair / "fold2" layout,
    :func:`unfold2_rows`).  Used by the GridPool score head so the trunk
    never relayouts to plain at full T (``x3d_coarse.py:362-370``)."""
    p_in = fold_pad(c_in) if p_in is None else p_in
    k2 = jnp.zeros((3, 2, 3, FOLD * p_in, 2 * c_out), w.dtype)
    for j in (0, 1):
        for dy in range(3):
            r = 2 * j - 1 + dy          # row offset within block Z
            kb, ph = (0, 3) if r < 0 else (1, r)
            k2 = k2.at[:, kb, :, ph * p_in:ph * p_in + c_in,
                       j * c_out:(j + 1) * c_out].set(w[:, dy])
    return k2


def unfold2_rows(x: jax.Array, c: int) -> jax.Array:
    """(B,T,Hb,W,2C) row-pair features → (B,T,2*Hb,W,C)."""
    b, t, hb, w, _ = x.shape
    x = x.reshape(b, t, hb, w, 2, c)
    x = jnp.moveaxis(x, 4, 3)
    return x.reshape(b, t, 2 * hb, w, c)


def fold_input_clips(x: jax.Array, p_c: int = 8) -> jax.Array:
    """Pack RGB clips (B,T,H,W,3) → (B,T,H/4,W/4,128): y-fold4 × w-fold4 with
    per-cell channels padded 3→``p_c``.  Lane order: (py, wq, c) —
    ``lane = (py*4 + wq) * p_c + c``.  Gets the 3-channel input out of its
    42x-padded channels-minor layout before any conv touches it."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // 4, 4, w // 4, 4, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # (b,t,H',W',py,wq,c)
    x = jnp.pad(x, [(0, 0)] * 6 + [(0, p_c - c)])
    return x.reshape(b, t, h // 4, w // 4, 16 * p_c)
