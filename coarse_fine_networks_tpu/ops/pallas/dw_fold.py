"""Pallas depthwise 3x3x3 stencil on fold4-layout tensors.

This is the kernel that makes the fold4 trunk win end-to-end (see
``ops/fold.py``): the bottleneck's depthwise conv (``x3d_fine.py:89-97``)
consumes and produces the row-folded layout directly, so the stream never
relayouts to the 2.4x-padded channels-minor form around the conv.

Layout recap: ``x[b,t,Y,w, py*P+c] = plain[b,t,4Y+py,w,c]`` — 4 row-phases
in the lane dimension, ``P = fold_pad(C)``.  In this layout the stencil's
three directions map onto cheap hardware moves:

* W taps   → static sublane-dim slices of a W-haloed VMEM tile;
* T/H taps → static slices of a T/H-haloed tile (grid over T and H-blocks);
* the H-phase shift inside a block → a **lane rotation by ±P** plus a
  per-lane-group select against the H±1 block rows for the wrapping phase.

Each grid step loads one haloed tile HBM→VMEM with 9 predicated DMAs (body +
4 edge strips + 4 corners; global edges stay zero = SAME padding), then runs
the 27-tap multiply-accumulate entirely in VMEM with an f32 accumulator.
The input is read from HBM once per tile (plus halo overlap) instead of once
per tap, and — the point — at fold4's ~1.2x lane padding instead of the
plain layout's 2.4x.

Backward is a custom VJP: ``dx`` is the same stencil with flipped taps
(SAME padding, k=3); ``dw`` is a second kernel accumulating 27 per-lane
partial reductions across grid steps, phase-summed to the canonical
``(3,3,3,1,C)`` gradient outside.

Stride (1,2,2) (layer1.block0) is the stride-1 kernel followed by an exact
fold-space 2x2 subsample.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fold import (FOLD, fold_matmul, fold_pad, from_fold4, pad_vec,
                    refold_y2_to_y4, to_fold4)

F32 = jnp.float32


def _lane_roll(z: jax.Array, shift: int, interpret: bool) -> jax.Array:
    """Rotate the lane (last) dim by ``shift`` (any sign).  Mosaic only
    implements 32-bit rotates on this toolchain; bf16 goes through a u32
    bitcast, which (verified on-chip) packs pairs of *sublanes* — the lane
    count is unchanged, so the shift is used as-is and the second-minor dim
    just has to be even."""
    n = z.shape[-1]
    shift = shift % n
    if shift == 0:
        return z
    if interpret or z.dtype.itemsize == 4:
        return pltpu.roll(z, shift=shift, axis=z.ndim - 1)
    assert z.dtype == jnp.bfloat16 and z.shape[-2] % 2 == 0
    zu = pltpu.bitcast(z, jnp.uint32)
    zu = pltpu.roll(zu, shift=shift, axis=zu.ndim - 1)
    return pltpu.bitcast(zu, jnp.bfloat16)


def _strip(h: int) -> int:
    """Largest divisor of h that is <= 7 (per-strip f32 accumulator size)."""
    for s in (7, 6, 5, 4, 8, 3, 2, 1):
        if s <= max(h, 1) and h % s == 0:
            return s
    return 1


def _pick_tiles(t: int, hb: int, w: int, lanes: int,
                itemsize: int, mm_lanes: int = 0) -> Tuple[int, int]:
    """(T-tile, H-tile) keeping tiles + accumulator + double-buffered output
    inside VMEM, preferring low halo overhead.  ``mm_lanes``: extra budget
    for the in-kernel matmul's activated tile (lanes_out wide) and its f32
    product."""
    budget = int(os.environ.get("CFN_TILE_BUDGET_MB", "12")) * 1024 * 1024
    best = (1, min(hb, 14))
    best_cost = None
    h_opts = [h for h in (hb, 14, 7) if h <= hb and hb % h == 0] or [hb]
    for ht in h_opts:
        for tt in (8, 4, 2, 1):
            if t % tt:
                continue
            sh = _strip(ht)
            in_tile = (tt + 2) * (ht + 2) * (w + 16) * lanes * itemsize
            acc = tt * sh * w * (mm_lanes or lanes) * 4
            r = (tt + 2) * sh * (w + 16) * (mm_lanes or lanes) * itemsize
            out2 = 2 * tt * ht * w * (mm_lanes or lanes) * itemsize
            mm = (tt + 2) * (ht + 2) * (w + 16) * mm_lanes * (itemsize + 4)
            if in_tile + acc + r + out2 + mm >= budget:
                continue
            halo = ((tt + 2) * (ht + 2)) / (tt * ht)
            if best_cost is None or halo < best_cost:
                best, best_cost = (tt, ht), halo
    return best


def _zero_frame(in_tile):
    """Zero only the halo frame — the body is overwritten by the DMA."""
    sh = in_tile.shape
    in_tile[0:1] = jnp.zeros((1,) + sh[1:], in_tile.dtype)
    in_tile[sh[0] - 1:] = jnp.zeros((1,) + sh[1:], in_tile.dtype)
    in_tile[1:sh[0] - 1, 0:1] = jnp.zeros((sh[0] - 2, 1) + sh[2:],
                                          in_tile.dtype)
    in_tile[1:sh[0] - 1, sh[1] - 1:] = jnp.zeros((sh[0] - 2, 1) + sh[2:],
                                                 in_tile.dtype)
    zw = jnp.zeros((sh[0] - 2, sh[1] - 2, 8, sh[3]), in_tile.dtype)
    in_tile[1:sh[0] - 1, 1:sh[1] - 1, 0:8] = zw
    in_tile[1:sh[0] - 1, 1:sh[1] - 1, sh[2] - 8:] = zw


def _start_loads(x_hbm, in_tile, sem, b, ti, hi, tt, ht, w, n_t, n_h):
    """Start the body + halo-strip + corner copies (no waits — the DMA
    engines overlap; :func:`_wait_all` drains them)."""
    t0 = ti * tt
    h0 = hi * ht

    def cp(src, dst):
        pltpu.make_async_copy(src, dst, sem).start()

    cp(x_hbm.at[b, pl.ds(t0, tt), pl.ds(h0, ht), :, :],
       in_tile.at[pl.ds(1, tt), pl.ds(1, ht), pl.ds(8, w), :])

    @pl.when(ti > 0)
    def _():
        cp(x_hbm.at[b, pl.ds(t0 - 1, 1), pl.ds(h0, ht), :, :],
           in_tile.at[pl.ds(0, 1), pl.ds(1, ht), pl.ds(8, w), :])

    @pl.when(ti < n_t - 1)
    def _():
        cp(x_hbm.at[b, pl.ds(t0 + tt, 1), pl.ds(h0, ht), :, :],
           in_tile.at[pl.ds(tt + 1, 1), pl.ds(1, ht), pl.ds(8, w), :])

    @pl.when(hi > 0)
    def _():
        cp(x_hbm.at[b, pl.ds(t0, tt), pl.ds(h0 - 1, 1), :, :],
           in_tile.at[pl.ds(1, tt), pl.ds(0, 1), pl.ds(8, w), :])

    @pl.when(hi < n_h - 1)
    def _():
        cp(x_hbm.at[b, pl.ds(t0, tt), pl.ds(h0 + ht, 1), :, :],
           in_tile.at[pl.ds(1, tt), pl.ds(ht + 1, 1), pl.ds(8, w), :])

    @pl.when(jnp.logical_and(ti > 0, hi > 0))
    def _():
        cp(x_hbm.at[b, pl.ds(t0 - 1, 1), pl.ds(h0 - 1, 1), :, :],
           in_tile.at[pl.ds(0, 1), pl.ds(0, 1), pl.ds(8, w), :])

    @pl.when(jnp.logical_and(ti > 0, hi < n_h - 1))
    def _():
        cp(x_hbm.at[b, pl.ds(t0 - 1, 1), pl.ds(h0 + ht, 1), :, :],
           in_tile.at[pl.ds(0, 1), pl.ds(ht + 1, 1), pl.ds(8, w), :])

    @pl.when(jnp.logical_and(ti < n_t - 1, hi > 0))
    def _():
        cp(x_hbm.at[b, pl.ds(t0 + tt, 1), pl.ds(h0 - 1, 1), :, :],
           in_tile.at[pl.ds(tt + 1, 1), pl.ds(0, 1), pl.ds(8, w), :])

    @pl.when(jnp.logical_and(ti < n_t - 1, hi < n_h - 1))
    def _():
        cp(x_hbm.at[b, pl.ds(t0 + tt, 1), pl.ds(h0 + ht, 1), :, :],
           in_tile.at[pl.ds(tt + 1, 1), pl.ds(ht + 1, 1), pl.ds(8, w), :])


def _load_halo_tile(x_hbm, in_tile, sem, b, ti, hi, tt, ht, w, n_t, n_h):
    """Zero the halo frame, start all copies, wait (SAME padding at global
    edges comes from the zeros)."""
    _zero_frame(in_tile)
    _start_loads(x_hbm, in_tile, sem, b, ti, hi, tt, ht, w, n_t, n_h)
    _wait_all(x_hbm, in_tile, sem, b, ti, hi, tt, ht, w, n_t, n_h)


def _wait_all(x_hbm, in_tile, sem, b, ti, hi, tt, ht, w, n_t, n_h):
    """Wait for the copies started by :func:`_load_halo_tile` — the same
    conditional structure so each started DMA gets exactly one wait."""
    t0, h0 = ti * tt, hi * ht

    def wt(src, dst):
        pltpu.make_async_copy(src, dst, sem).wait()

    wt(x_hbm.at[b, pl.ds(t0, tt), pl.ds(h0, ht), :, :],
       in_tile.at[pl.ds(1, tt), pl.ds(1, ht), pl.ds(8, w), :])

    @pl.when(ti > 0)
    def _():
        wt(x_hbm.at[b, pl.ds(t0 - 1, 1), pl.ds(h0, ht), :, :],
           in_tile.at[pl.ds(0, 1), pl.ds(1, ht), pl.ds(8, w), :])

    @pl.when(ti < n_t - 1)
    def _():
        wt(x_hbm.at[b, pl.ds(t0 + tt, 1), pl.ds(h0, ht), :, :],
           in_tile.at[pl.ds(tt + 1, 1), pl.ds(1, ht), pl.ds(8, w), :])

    @pl.when(hi > 0)
    def _():
        wt(x_hbm.at[b, pl.ds(t0, tt), pl.ds(h0 - 1, 1), :, :],
           in_tile.at[pl.ds(1, tt), pl.ds(0, 1), pl.ds(8, w), :])

    @pl.when(hi < n_h - 1)
    def _():
        wt(x_hbm.at[b, pl.ds(t0, tt), pl.ds(h0 + ht, 1), :, :],
           in_tile.at[pl.ds(1, tt), pl.ds(ht + 1, 1), pl.ds(8, w), :])

    @pl.when(jnp.logical_and(ti > 0, hi > 0))
    def _():
        wt(x_hbm.at[b, pl.ds(t0 - 1, 1), pl.ds(h0 - 1, 1), :, :],
           in_tile.at[pl.ds(0, 1), pl.ds(0, 1), pl.ds(8, w), :])

    @pl.when(jnp.logical_and(ti > 0, hi < n_h - 1))
    def _():
        wt(x_hbm.at[b, pl.ds(t0 - 1, 1), pl.ds(h0 + ht, 1), :, :],
           in_tile.at[pl.ds(0, 1), pl.ds(ht + 1, 1), pl.ds(8, w), :])

    @pl.when(jnp.logical_and(ti < n_t - 1, hi > 0))
    def _():
        wt(x_hbm.at[b, pl.ds(t0 + tt, 1), pl.ds(h0 - 1, 1), :, :],
           in_tile.at[pl.ds(tt + 1, 1), pl.ds(0, 1), pl.ds(8, w), :])

    @pl.when(jnp.logical_and(ti < n_t - 1, hi < n_h - 1))
    def _():
        wt(x_hbm.at[b, pl.ds(t0 + tt, 1), pl.ds(h0 + ht, 1), :, :],
           in_tile.at[pl.ds(tt + 1, 1), pl.ds(ht + 1, 1), pl.ds(8, w), :])


def _rezero_frame(in_tile, ti, hi, n_t, n_h, w, has_bottom_halo=True):
    """Restore the zeros that SAME padding relies on after an in-VMEM
    activation pass: the W pad columns always, and the T/H halo strips when
    they are global edges (``bi`` would otherwise leak ``relu(bi)`` into the
    padding)."""
    sh = in_tile.shape
    zeros_w = jnp.zeros(sh[:-2] + (8, sh[-1]), in_tile.dtype)
    in_tile[..., 0:8, :] = zeros_w
    in_tile[..., 8 + w:, :] = zeros_w[..., : sh[-2] - 8 - w, :]
    zrow_t = jnp.zeros((1,) + sh[1:], in_tile.dtype)
    zrow_h = jnp.zeros((sh[0], 1) + sh[2:], in_tile.dtype)

    @pl.when(ti == 0)
    def _():
        in_tile[0:1] = zrow_t

    @pl.when(ti == n_t - 1)
    def _():
        in_tile[sh[0] - 1:] = zrow_t

    @pl.when(hi == 0)
    def _():
        in_tile[:, 0:1] = zrow_h

    if has_bottom_halo:
        @pl.when(hi == n_h - 1)
        def _():
            in_tile[:, sh[1] - 1:] = zrow_h


def _act_tile(in_tile, sc_ref, bi_ref, ti, hi, n_t, n_h, w,
              has_bottom_halo=True):
    """Apply the fused BN-apply+ReLU ``relu(x*sc + bi)`` to a loaded halo
    tile in VMEM, then restore the SAME-padding zero frame
    (:func:`_rezero_frame`).  Pad lanes have ``sc = bi = 0`` so they stay
    zero."""
    t = in_tile[...]
    a = jnp.maximum(
        t.astype(F32) * sc_ref[...][(None,) * (t.ndim - 1)]
        + bi_ref[...][(None,) * (t.ndim - 1)], 0.0)
    in_tile[...] = a.astype(in_tile.dtype)
    _rezero_frame(in_tile, ti, hi, n_t, n_h, w, has_bottom_halo)


def _mm_act_tile(in_tile, a_tile, wmm_ref, sc_ref, bi_ref, ti, hi, n_t, n_h,
                 w, has_bottom_halo=True):
    """``a_tile <- relu((in_tile @ wmm)*sc + bi)``: the block-diagonal
    pointwise conv (an MXU matmul over the lane dim, lanes_in -> lanes_out)
    runs on the loaded halo tile in VMEM, so the conv output never
    round-trips HBM.  Halo rows are recomputed (the matmul is pointwise over
    positions, so neighbour-tile overlap is exact); the zero frame is
    restored afterwards (:func:`_rezero_frame`)."""
    t = in_tile[...]
    sh = t.shape
    lo = wmm_ref.shape[1]
    prod = jnp.dot(t.reshape(-1, sh[-1]), wmm_ref[...],
                   preferred_element_type=F32)
    a = jnp.maximum(prod * sc_ref[...][None, :] + bi_ref[...][None, :], 0.0)
    a_tile[...] = a.reshape(sh[:-1] + (lo,)).astype(a_tile.dtype)
    _rezero_frame(a_tile, ti, hi, n_t, n_h, w, has_bottom_halo)


def _taps(in_tile, h, sh, p, lanes, tt, w, interpret):
    """Yield (tap_index, f32 (tt, sh, w, lanes) slab) for the 27 taps of one
    output strip starting at tile row h.  Each dy-arrangement is converted to
    f32 ONCE (3 converts per strip, not 27) — the stencil is VPU-bound, so
    redundant converts cost as much as the tap FMAs themselves."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, lanes), 3)
    mask_up = lane < p          # dy=+1: wrapped phase comes from block Y+1
    mask_dn = lane >= 3 * p     # dy=-1: wrapped phase from block Y-1
    a_same = in_tile[:, pl.ds(1 + h, sh), :, :]
    a_same_f = a_same.astype(F32)
    for dy in (-1, 0, 1):
        if dy == 0:
            r = a_same_f
        else:
            a_sh = in_tile[:, pl.ds(1 + h + dy, sh), :, :]
            mask = mask_up if dy == 1 else mask_dn
            z = jnp.where(mask, a_sh.astype(F32), a_same_f)
            r = _lane_roll(z, -dy * p, interpret)
        for dx in range(3):
            # column j of the output reads slab column 8 + j + (dx-1);
            # misaligned sublane value-slices lower fine (verified on-chip)
            body = r[:, :, 7 + dx:7 + dx + w, :]
            for dt in range(3):
                tap = (dt * 3 + (dy + 1)) * 3 + dx
                yield tap, body[dt:dt + tt]


def _s2_epilogue(acc, p, lanes, o_dtype, interpret):
    """Fuse the (1,2,2) subsample into the output write: ``acc`` holds one
    full-resolution block-row *pair* (tt, 2, W, L); the stride-2 output block
    row keeps even W columns (extracted via the bf16→u32 sublane-pair bitcast
    — f32 has no packing, so compiled f32 uses the full-res path instead) and
    regroups phases {0,2} of the pair into the four output phases."""
    if interpret:
        eb = acc.astype(o_dtype)[:, :, 0::2, :]
    else:
        ab = acc.astype(jnp.bfloat16)
        u = pltpu.bitcast(ab, jnp.uint32)              # (tt,2?,W/2,L) pairs W
        eb = pltpu.bitcast((u & jnp.uint32(0xFFFF)) << 16, jnp.float32)
        eb = eb.astype(jnp.bfloat16)
    r0, r1 = eb[:, 0], eb[:, 1]                        # (tt, W/2, L)
    a1 = _lane_roll(r0, -p, interpret)                 # g1 ← r0 phase 2
    a2 = _lane_roll(r1, 2 * p, interpret)              # g2 ← r1 phase 0
    a3 = _lane_roll(r1, p, interpret)                  # g3 ← r1 phase 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2)
    out = jnp.where(lane < p, r0,
                    jnp.where(lane < 2 * p, a1,
                              jnp.where(lane < 3 * p, a2, a3)))
    return out.astype(o_dtype)


def _halo_io(x_hbm, tile, sem, b, ti, hi, tt, ht, w, n_t, n_h, phases):
    if "start" in phases:
        _start_loads(x_hbm, tile, sem, b, ti, hi, tt, ht, w, n_t, n_h)
    if "wait" in phases:
        _wait_all(x_hbm, tile, sem, b, ti, hi, tt, ht, w, n_t, n_h)


def _prefetch_pipeline(g, n_b, n_t, n_h, tiles, sems, zero_fn, io_fn):
    """Two-slot cross-grid-step prefetch: at step ``g`` start the loads for
    step ``g+1`` into the other slot before waiting on this step's — the DMA
    hides behind the (VPU-bound) tap loop.  ``io_fn(tile, sem, b, ti, hi,
    phases)`` starts and/or waits the copies; returns the current tile ref."""
    total = n_b * n_t * n_h
    slot = jax.lax.rem(g, 2)
    nslot = 1 - slot
    b, r = g // (n_t * n_h), g % (n_t * n_h)
    ti, hi = r // n_h, r % n_h

    @pl.when(g == 0)
    def _():
        zero_fn(tiles.at[slot])
        io_fn(tiles.at[slot], sems.at[slot], b, ti, hi, ("start",))

    @pl.when(g + 1 < total)
    def _():
        g1 = g + 1
        b2, r2 = g1 // (n_t * n_h), g1 % (n_t * n_h)
        zero_fn(tiles.at[nslot])
        io_fn(tiles.at[nslot], sems.at[nslot], b2, r2 // n_h, r2 % n_h,
              ("start",))

    io_fn(tiles.at[slot], sems.at[slot], b, ti, hi, ("wait",))
    return tiles.at[slot]


def _fwd_kernel(*args, tt, ht, w, lanes, p, n_t, n_h, n_b, interpret,
                stride2=False, act=False, mm=False, dxmask=False,
                actmask=False):
    """Stride-1 stencil with a two-slot pipelined input tile: each grid step
    prefetches the NEXT step's haloed tile while computing the current one,
    hiding the DMA latency behind the (VPU-bound) tap loop.  With ``mm`` the
    preceding pointwise conv (lanes_in -> lanes) runs in-kernel on the MXU
    (:func:`_mm_act_tile`); ``lanes``/``p`` describe the tap (output) lanes.

    ``dxmask``: the dx pass of the matmul-fused entry — the stencil runs
    over the upstream cotangent and the output is masked in-kernel by the
    relu derivative recomputed from the *pre-matmul* input ``x2`` (an MXU
    matmul per strip), so neither ``da``, the pred mask, nor the masked
    product round-trips HBM as separate tensors."""
    if actmask:
        (w_ref, sc_ref, bi_ref, x_hbm, x2_hbm, o_ref, r_ref, tiles,
         x2_tiles, sem2, xsem) = args
    elif dxmask:
        (w_ref, wmm_ref, sc_ref, bi_ref, x_hbm, x2_hbm, o_ref, tiles,
         x2_tiles, sem2, xsem) = args
    elif mm:
        w_ref, wmm_ref, sc_ref, bi_ref, x_hbm, o_ref, tiles, a_tile, sem2 \
            = args
    elif act:
        w_ref, sc_ref, bi_ref, x_hbm, o_ref, tiles, sem2, = args
    else:
        w_ref, x_hbm, o_ref, tiles, sem2 = args
    b, ti, hi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    g = (b * n_t + ti) * n_h + hi
    io = functools.partial(_halo_io, x_hbm, tt=tt, ht=ht, w=w, n_t=n_t,
                           n_h=n_h)
    in_tile = _prefetch_pipeline(
        g, n_b, n_t, n_h, tiles, sem2, _zero_frame,
        lambda tile, sm, b2, t2, h2, ph: io(tile, sm, b2, t2, h2, phases=ph))
    x2_tile = None
    if dxmask or actmask:
        def x2_io(tile, sm, b2, t2, h2, phases):
            d = pltpu.make_async_copy(
                x2_hbm.at[b2, pl.ds(t2 * tt, tt), pl.ds(h2 * ht, ht), :, :],
                tile, sm)
            if "start" in phases:
                d.start()
            if "wait" in phases:
                d.wait()

        x2_tile = _prefetch_pipeline(
            g, n_b, n_t, n_h, x2_tiles, xsem, lambda t: None, x2_io)
    if actmask:
        @pl.when(jnp.logical_and(ti == 0, hi == 0))
        def _():
            r_ref[...] = jnp.zeros(r_ref.shape, r_ref.dtype)
    if mm:
        _mm_act_tile(in_tile, a_tile, wmm_ref, sc_ref, bi_ref, ti, hi,
                     n_t, n_h, w)
        in_tile = a_tile
    elif act:
        _act_tile(in_tile, sc_ref, bi_ref, ti, hi, n_t, n_h, w)

    if stride2:
        for s in range(ht // 2):
            h = 2 * s
            acc = jnp.zeros((tt, 2, w, lanes), F32)
            for tap, slab in _taps(in_tile, h, 2, p, lanes, tt, w, interpret):
                acc += slab * w_ref[tap, :][None, None, None, :]
            o_ref[0, :, s, :, :] = _s2_epilogue(acc, p, lanes, o_ref.dtype,
                                                interpret)
        return

    sh = _strip(ht)
    for s in range(ht // sh):
        h = s * sh
        acc = jnp.zeros((tt, sh, w, lanes), F32)
        for tap, slab in _taps(in_tile, h, sh, p, lanes, tt, w, interpret):
            acc += slab * w_ref[tap, :][None, None, None, :]
        if dxmask:
            # relu' from the recomputed product: the same per-element MXU
            # dot as the forward's _mm_act_tile, so the mask agrees with
            # the forward's activation decision
            xs = x2_tile[:, pl.ds(h, sh), :, :]
            zr = jnp.dot(xs.reshape(tt * sh * w, xs.shape[-1]), wmm_ref[...],
                         preferred_element_type=F32)
            zh = zr * sc_ref[...][None, :] + bi_ref[...][None, :]
            keep = (zh > 0).reshape(tt, sh, w, lanes)
            acc = jnp.where(keep, acc, 0.0)
        elif actmask:
            # the act path's whole XLA backward epilogue, in-kernel: relu'
            # is elementwise from the materialised BN input (no matmul),
            # the output is dam·sc, and the (dsc, dbi) reductions
            # accumulate into per-batch partials
            sc_v = sc_ref[...][None, None, None, :]
            xs = x2_tile[:, pl.ds(h, sh), :, :].astype(F32)
            zh = xs * sc_v + bi_ref[...][None, None, None, :]
            dam = jnp.where(zh > 0, acc, 0.0)
            r_ref[0, 0, :] += jnp.sum(dam * xs, axis=(0, 1, 2))
            r_ref[0, 1, :] += jnp.sum(dam, axis=(0, 1, 2))
            acc = dam * sc_v
        o_ref[0, :, pl.ds(h, sh), :, :] = acc.astype(o_ref.dtype)


def _wgrad_kernel(*args, tt, ht, w, lanes, p, n_t, n_h, n_b, interpret,
                  act=False, mm=False):
    if mm:
        (wmm_ref, sc_ref, bi_ref, x_hbm, g_hbm, o_ref, x_tiles, g_tiles,
         a_tile, xsem, gsem) = args
    elif act:
        sc_ref, bi_ref, x_hbm, g_hbm, o_ref, x_tiles, g_tiles, xsem, gsem \
            = args
    else:
        x_hbm, g_hbm, o_ref, x_tiles, g_tiles, xsem, gsem = args
    b, ti, hi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    g_idx = (b * n_t + ti) * n_h + hi

    @pl.when(g_idx == 0)
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)

    def g_io(tile, sm, b2, t2, h2, phases):
        d = pltpu.make_async_copy(
            g_hbm.at[b2, pl.ds(t2 * tt, tt), pl.ds(h2 * ht, ht), :, :],
            tile, sm)
        if "start" in phases:
            d.start()
        if "wait" in phases:
            d.wait()

    in_tile = _prefetch_pipeline(
        g_idx, n_b, n_t, n_h, x_tiles, xsem, _zero_frame,
        lambda tile, sm, b2, t2, h2, ph: _halo_io(
            x_hbm, tile, sm, b2, t2, h2, tt, ht, w, n_t, n_h, ph))
    g_tile = _prefetch_pipeline(
        g_idx, n_b, n_t, n_h, g_tiles, gsem, lambda t: None, g_io)
    if mm:
        _mm_act_tile(in_tile, a_tile, wmm_ref, sc_ref, bi_ref, ti, hi,
                     n_t, n_h, w)
        in_tile = a_tile
    elif act:
        _act_tile(in_tile, sc_ref, bi_ref, ti, hi, n_t, n_h, w)

    sh = _strip(ht)
    for s in range(ht // sh):
        h = s * sh
        gs = g_tile[:, pl.ds(h, sh), :, :].astype(F32)
        for tap, slab in _taps(in_tile, h, sh, p, lanes, tt, w, interpret):
            o_ref[tap, :] += jnp.sum(slab * gs, axis=(0, 1, 2))


def _prep_lane_weights(w: jax.Array, c: int, p: int) -> jax.Array:
    """(3,3,3,1,C) → (27, 4P) per-lane tap vectors (phase-tiled, zero pad)."""
    wt = w.reshape(27, c).astype(F32)
    wt = jnp.pad(wt, ((0, 0), (0, p - c)))
    return jnp.tile(wt, (1, FOLD))


def _dw_fold4_pcall(x: jax.Array, w_lane: jax.Array, interpret: bool,
                    sc=None, bi=None, wmm=None) -> jax.Array:
    b, t, hb, w, lanes_in = x.shape
    lanes = wmm.shape[1] if wmm is not None else lanes_in
    p = lanes // FOLD
    act = sc is not None
    mm = wmm is not None
    tt, ht = _pick_tiles(t, hb, w, lanes_in, x.dtype.itemsize,
                         mm_lanes=lanes if mm else 0)
    n_t, n_h = t // tt, hb // ht

    kernel = functools.partial(
        _fwd_kernel, tt=tt, ht=ht, w=w, lanes=lanes, p=p, n_t=n_t, n_h=n_h,
        n_b=b, interpret=interpret, act=act, mm=mm)
    if mm:
        ops = (w_lane, wmm, sc, bi, x)
    elif act:
        ops = (w_lane, sc, bi, x)
    else:
        ops = (w_lane, x)
    a_scr = ([pltpu.VMEM((tt + 2, ht + 2, w + 16, lanes), x.dtype)]
             if mm else [])
    return pl.pallas_call(
        kernel,
        grid=(b, n_t, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(ops) - 1) + [
            pl.BlockSpec(memory_space=pltpu.ANY),    # x stays in HBM
        ],
        out_specs=pl.BlockSpec((1, tt, ht, w, lanes),
                               lambda bi, ti, hi: (bi, ti, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape[:-1] + (lanes,), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 2, ht + 2, w + 16, lanes_in), x.dtype),
            *a_scr,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ops)


def _dx_mask_pcall(g: jax.Array, w_lane: jax.Array, interpret: bool,
                   sc=None, bi=None, wmm=None, x2=None) -> jax.Array:
    """dx of the matmul-fused entry with the relu mask applied in-kernel:
    ``dam = stencil(g, w_flip) ⊙ 1[(x2 @ wmm)·sc + bi > 0]``.  ``g`` is the
    upstream cotangent at lanes_out; ``x2`` the pre-matmul input at
    lanes_in (read non-haloed — the mask is pointwise)."""
    b, t, hb, w, lanes = g.shape
    lanes_in = x2.shape[-1]
    p = lanes // FOLD
    tt, ht = _pick_tiles(t, hb, w, lanes, g.dtype.itemsize, mm_lanes=lanes)
    n_t, n_h = t // tt, hb // ht

    kernel = functools.partial(
        _fwd_kernel, tt=tt, ht=ht, w=w, lanes=lanes, p=p, n_t=n_t, n_h=n_h,
        n_b=b, interpret=interpret, dxmask=True)
    return pl.pallas_call(
        kernel,
        grid=(b, n_t, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 + [
            pl.BlockSpec(memory_space=pltpu.ANY),    # g stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),    # x2 stays in HBM
        ],
        out_specs=pl.BlockSpec((1, tt, ht, w, lanes),
                               lambda bi, ti, hi: (bi, ti, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(g.shape, g.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 2, ht + 2, w + 16, lanes), g.dtype),
            pltpu.VMEM((2, tt, ht, w, lanes_in), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w_lane, wmm, sc, bi, g, x2)


def _dx_act_pcall(g: jax.Array, w_lane: jax.Array, interpret: bool,
                  sc=None, bi=None, x2=None):
    """dx of the act-fused conv with the whole XLA backward epilogue run
    in-kernel: relu' from the materialised BN input ``x2`` (elementwise —
    no matmul), output ``dam·sc``, and per-batch ``(dsc, dbi)`` partial
    reductions as a second output ``(B, 2, lanes)``."""
    b, t, hb, w, lanes = g.shape
    p = lanes // FOLD
    tt, ht = _pick_tiles(t, hb, w, lanes, g.dtype.itemsize, mm_lanes=lanes)
    n_t, n_h = t // tt, hb // ht

    kernel = functools.partial(
        _fwd_kernel, tt=tt, ht=ht, w=w, lanes=lanes, p=p, n_t=n_t, n_h=n_h,
        n_b=b, interpret=interpret, actmask=True)
    return pl.pallas_call(
        kernel,
        grid=(b, n_t, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 3 + [
            pl.BlockSpec(memory_space=pltpu.ANY),    # g stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),    # x2 stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, tt, ht, w, lanes),
                         lambda bi, ti, hi: (bi, ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, lanes), lambda bi, ti, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(g.shape, g.dtype),
            jax.ShapeDtypeStruct((b, 2, lanes), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tt + 2, ht + 2, w + 16, lanes), g.dtype),
            pltpu.VMEM((2, tt, ht, w, lanes), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w_lane, sc, bi, g, x2)


def _dx_s2_act_pcall(g: jax.Array, w_lane: jax.Array, interpret: bool,
                     sc=None, bi=None, x2=None):
    """Stride-2 shape of :func:`_dx_act_pcall`: ``g`` half-res, ``x2`` the
    full-res BN input; outputs (masked ``dam·sc`` full-res, per-batch
    ``(dsc, dbi)`` partials)."""
    b, t, hb2, w2, lanes = g.shape
    p = lanes // FOLD
    tt, ht = _pick_tiles_s2(t, hb2, w2, lanes, g.dtype.itemsize,
                            mm_lanes=lanes)
    n_t, n_h = t // tt, hb2 // ht
    kernel = functools.partial(
        _dx_s2_kernel, tt=tt, ht=ht, w2=w2, lanes=lanes, p=p, n_t=n_t,
        n_h=n_h, n_b=b, interpret=interpret, actmask=True)
    return pl.pallas_call(
        kernel,
        grid=(b, n_t, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 3 + [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, tt, 2 * ht, 2 * w2, lanes),
                         lambda bi, ti, hi: (bi, ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, lanes), lambda bi, ti, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, 2 * hb2, 2 * w2, lanes), g.dtype),
            jax.ShapeDtypeStruct((b, 2, lanes), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tt + 2, ht + 2, w2 + 16, lanes), g.dtype),
            pltpu.VMEM((2, tt + 2, 2 * ht + 1, 2 * w2 + 16, lanes),
                       x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w_lane, sc, bi, g, x2)


def _dw_fold4_wgrad_pcall(x: jax.Array, g: jax.Array, interpret: bool,
                          sc=None, bi=None, wmm=None) -> jax.Array:
    b, t, hb, w, lanes_in = x.shape
    lanes = wmm.shape[1] if wmm is not None else lanes_in
    p = lanes // FOLD
    act = sc is not None
    mm = wmm is not None
    tt, ht = _pick_tiles(t, hb, w, lanes_in, x.dtype.itemsize,
                         mm_lanes=lanes if mm else 0)
    n_t, n_h = t // tt, hb // ht

    kernel = functools.partial(
        _wgrad_kernel, tt=tt, ht=ht, w=w, lanes=lanes, p=p, n_t=n_t, n_h=n_h,
        n_b=b, interpret=interpret, act=act, mm=mm)
    if mm:
        ops = (wmm, sc, bi, x, g)
        vec = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    elif act:
        ops = (sc, bi, x, g)
        vec = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    else:
        ops = (x, g)
        vec = []
    a_scr = ([pltpu.VMEM((tt + 2, ht + 2, w + 16, lanes), x.dtype)]
             if mm else [])
    return pl.pallas_call(
        kernel,
        grid=(b, n_t, n_h),
        in_specs=[
            *vec,
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((27, lanes), lambda bi, ti, hi: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27, lanes), F32),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 2, ht + 2, w + 16, lanes_in), x.dtype),
            pltpu.VMEM((2, tt, ht, w, lanes), g.dtype),
            *a_scr,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ops)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dw_fold4(x: jax.Array, w: jax.Array, c: int, interpret: bool = False
             ) -> jax.Array:
    """Depthwise 3x3x3, stride 1, SAME padding, on a fold4 tensor.

    Args:
      x: (B, T, H/4, W, 4P) fold4 tensor (``ops.fold``).
      w: canonical depthwise kernel (3, 3, 3, 1, C).
      c: logical channel count (C <= P).
    """
    p = x.shape[-1] // FOLD
    return _dw_fold4_raw(x, _prep_lane_weights(w, c, p), interpret)


def _dw_fold4_fwd(x, w, c, interpret):
    return dw_fold4(x, w, c, interpret), (x, w)


def _dw_fold4_bwd(c, interpret, res, g):
    x, w = res
    p = x.shape[-1] // FOLD
    w_flip = jnp.flip(w, axis=(0, 1, 2))
    dx = _dw_fold4_raw(g, _prep_lane_weights(w_flip, c, p), interpret)
    dk_lane = _dw_fold4_wgrad_raw(x, g, interpret)        # (27, 4P)
    dk = dk_lane.reshape(27, FOLD, p).sum(axis=1)[:, :c]  # phase-sum
    dk = dk.reshape(3, 3, 3, 1, c).astype(w.dtype)
    return dx, dk


dw_fold4.defvjp(_dw_fold4_fwd, _dw_fold4_bwd)


def _dw_fold4_s2_raw(x: jax.Array, w_lane: jax.Array, interpret: bool
                     ) -> jax.Array:
    b, t, hb, w, lanes = x.shape
    p = lanes // FOLD
    tt, _ = _pick_tiles(t, hb, w, lanes, x.dtype.itemsize)
    # H-tile must pair full-res block rows; prefer the largest even divisor
    ht = next(h for h in (14, 12, 10, 8, 6, 4, 2, hb)
              if hb % h == 0 and h % 2 == 0)
    n_t, n_h = t // tt, hb // ht

    kernel = functools.partial(
        _fwd_kernel, tt=tt, ht=ht, w=w, lanes=lanes, p=p, n_t=n_t, n_h=n_h,
        n_b=b, interpret=interpret, stride2=True)
    return pl.pallas_call(
        kernel,
        grid=(b, n_t, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, tt, ht // 2, w // 2, lanes),
                               lambda bi, ti, hi: (bi, ti, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, hb // 2, w // 2, lanes),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 2, ht + 2, w + 16, lanes), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w_lane, x)


# ---- dedicated stride-2 backward kernels -----------------------------------
#
# y[t,m,n] = Σ_{dt,dy,dxx} w · x[t+dt-1, 2m+dy-1, 2n+dxx-1]  (fwd, s=(1,2,2))
#
# dx[t,r,c] = Σ_taps w[dt,dy,dxx] · g[t-dt+1, (r-dy+1)/2, (c-dxx+1)/2]
#   (terms where the divisions are integral) — rather than zero-upsampling g
#   to full resolution (3 extra full-res passes), these kernels read the
#   half-res g directly.  Row parity picks the dy taps (even r: dy=1; odd r:
#   dy∈{0,2}); col parity picks dxx the same way, so the accumulation runs as
#   separate even/odd-column accumulators at W/2 that a bf16 sublane-pair
#   bitcast interleaves on the way out.
#
# dk[dt,dy,dxx] = Σ g[t,m,u] · x[t+dt-1, 2m+dy-1, 2u+dxx-1]: per g block row
#   the strided x rows are fixed (block, phase) pairs — 4-pick lane
#   arrangements — and strided x cols are a sublane-pair deinterleave.


def _interleave_w(e: jax.Array, o: jax.Array, interpret: bool) -> jax.Array:
    """Interleave two (…, W2, L) slabs into (…, 2*W2, L) along the sublane
    axis: out[2u]=e[u], out[2u+1]=o[u].  bf16 path packs via the u32 sublane-
    pair bitcast (bf16→f32 widening is an exact <<16)."""
    if interpret:
        s = jnp.stack([e, o], axis=-2)  # (…, W2, 2, L)
        return s.reshape(*e.shape[:-2], 2 * e.shape[-2], e.shape[-1])
    eu = pltpu.bitcast(e.astype(jnp.float32), jnp.uint32)  # e in high 16
    ou = pltpu.bitcast(o.astype(jnp.float32), jnp.uint32)
    word = (eu >> 16) | (ou & jnp.uint32(0xFFFF0000))      # lo=e, hi=o
    return pltpu.bitcast(word, jnp.bfloat16)


def _deinterleave_w(x: jax.Array, interpret: bool):
    """(…, W, L) → even (…, W/2, L), odd (…, W/2, L) along sublanes."""
    if interpret:
        v = x.reshape(*x.shape[:-2], x.shape[-2] // 2, 2, x.shape[-1])
        return v[..., 0, :], v[..., 1, :]
    u = pltpu.bitcast(x, jnp.uint32)
    even = pltpu.bitcast((u & jnp.uint32(0xFFFF)) << 16, jnp.float32)
    odd = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return even.astype(jnp.bfloat16), odd.astype(jnp.bfloat16)


def _slot_select(picks, slabs, p: int, lanes: int, interpret: bool):
    """Build the lane arrangement ``out[slot·P+c] = slabs[row][rho·P+c]`` from
    ``picks = [(slot, rho, row_key), …]``; unlisted slots are zero."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2)
    out = None
    for slot, rho, row_key in picks:
        src = slabs[row_key]
        r = _lane_roll(src, (slot - rho) * p, interpret)
        m = jnp.logical_and(lane >= slot * p, lane < (slot + 1) * p)
        out = jnp.where(m, r, 0 if out is None else out)
    return out


# (dy, o) → two (slot, g-phase, same/next block) picks; o is the member of
# the full-res block pair Y = 2Z+o produced from g block Z (see derivation
# above: slot py reads g row 4Z + 2o + (py-dy+1)/2).
_DX_PICKS = {
    (0, 0): [(1, 1, 0), (3, 2, 0)],
    (1, 0): [(0, 0, 0), (2, 1, 0)],
    (2, 0): [(1, 0, 0), (3, 1, 0)],
    (0, 1): [(1, 3, 0), (3, 0, 1)],
    (1, 1): [(0, 2, 0), (2, 3, 0)],
    (2, 1): [(1, 2, 0), (3, 3, 0)],
}


def _dx_s2_kernel(*args, tt, ht, w2, lanes, p, n_t, n_h, n_b, interpret,
                  mask=False, actmask=False):
    if actmask:
        (w_ref, sc_ref, bi_ref, g_hbm, x_hbm, o_ref, r_ref, g_tiles,
         x_tiles, sem2, xsem) = args
    elif mask:
        (w_ref, wmm_ref, sc_ref, bi_ref, g_hbm, x_hbm, o_ref, g_tiles,
         x_tiles, sem2, xsem) = args
    else:
        w_ref, g_hbm, o_ref, g_tiles, sem2 = args
    b, ti, hi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    g_idx = (b * n_t + ti) * n_h + hi
    g_tile = _prefetch_pipeline(
        g_idx, n_b, n_t, n_h, g_tiles, sem2, _zero_frame,
        lambda tile, sm, b2, t2, h2, ph: _halo_io(
            g_hbm, tile, sm, b2, t2, h2, tt, ht, w2, n_t, n_h, ph))
    x_tile = None
    if mask or actmask:
        # the mask source at FULL res (pre-matmul input for dxmask, the
        # materialised BN input for actmask): even/odd columns mask
        # acc_e/acc_o
        x_tile = _prefetch_pipeline(
            g_idx, n_b, n_t, n_h, x_tiles, xsem, _zero_frame_x2,
            lambda tile, sm, b2, t2, h2, ph: _x2_io(
                x_hbm, tile, sm, b2, t2, h2, tt, ht, 2 * w2, n_t, n_h, ph))
    if actmask:
        @pl.when(jnp.logical_and(ti == 0, hi == 0))
        def _():
            r_ref[...] = jnp.zeros(r_ref.shape, r_ref.dtype)

    for z in range(ht):
        slabs = {0: g_tile[:, 1 + z, :, :], 1: g_tile[:, 2 + z, :, :]}
        for o in (0, 1):
            acc_e = jnp.zeros((tt, w2, lanes), F32)
            acc_o = jnp.zeros((tt, w2, lanes), F32)
            for dy in range(3):
                arr = _slot_select(_DX_PICKS[(dy, o)], slabs, p, lanes,
                                   interpret).astype(F32)
                for dt in range(3):
                    a = arr[2 - dt:2 - dt + tt]      # g[t - dt + 1]
                    base = (dt * 3 + dy) * 3
                    acc_e += (a[:, 8:8 + w2, :]
                              * w_ref[base + 1, :][None, None, :])
                    acc_o += (a[:, 9:9 + w2, :]
                              * w_ref[base, :][None, None, :])
                    acc_o += (a[:, 8:8 + w2, :]
                              * w_ref[base + 2, :][None, None, :])
            if mask:
                xs = x_tile[pl.ds(1, tt), 1 + 2 * z + o, pl.ds(8, 2 * w2), :]
                ex, ox = _deinterleave_w(xs, interpret)
                ze = jnp.dot(ex.reshape(tt * w2, ex.shape[-1]), wmm_ref[...],
                             preferred_element_type=F32)
                ke = (ze * sc_ref[...][None, :]
                      + bi_ref[...][None, :]).reshape(tt, w2, lanes) > 0
                acc_e = jnp.where(ke, acc_e, 0.0)
                zo = jnp.dot(ox.reshape(tt * w2, ox.shape[-1]), wmm_ref[...],
                             preferred_element_type=F32)
                ko = (zo * sc_ref[...][None, :]
                      + bi_ref[...][None, :]).reshape(tt, w2, lanes) > 0
                acc_o = jnp.where(ko, acc_o, 0.0)
            elif actmask:
                xs = x_tile[pl.ds(1, tt), 1 + 2 * z + o, pl.ds(8, 2 * w2), :]
                ex, ox = _deinterleave_w(xs, interpret)
                sc_v = sc_ref[...][None, None, :]
                bi_v = bi_ref[...][None, None, :]
                exf, oxf = ex.astype(F32), ox.astype(F32)
                dam_e = jnp.where(exf * sc_v + bi_v > 0, acc_e, 0.0)
                dam_o = jnp.where(oxf * sc_v + bi_v > 0, acc_o, 0.0)
                r_ref[0, 0, :] += jnp.sum(dam_e * exf + dam_o * oxf,
                                          axis=(0, 1))
                r_ref[0, 1, :] += jnp.sum(dam_e + dam_o, axis=(0, 1))
                acc_e, acc_o = dam_e * sc_v, dam_o * sc_v
            o_ref[0, :, 2 * z + o, :, :] = _interleave_w(
                acc_e.astype(o_ref.dtype), acc_o.astype(o_ref.dtype),
                interpret)


# dy → four (slot, x-phase, x tile row offset vs 2z) picks for the wgrad
# arrangement: slot pg reads x row 8Z + 2·pg + dy − 1 (tile row 1+2z+δ holds
# x block 2Z+δ; row 2z is the block above).
_WG_PICKS = {
    0: [(0, 3, 0), (1, 1, 1), (2, 3, 1), (3, 1, 2)],
    1: [(0, 0, 1), (1, 2, 1), (2, 0, 2), (3, 2, 2)],
    2: [(0, 1, 1), (1, 3, 1), (2, 1, 2), (3, 3, 2)],
}


def _zero_frame_x2(x_tile):
    sh = x_tile.shape
    x_tile[0:1] = jnp.zeros((1,) + sh[1:], x_tile.dtype)
    x_tile[sh[0] - 1:] = jnp.zeros((1,) + sh[1:], x_tile.dtype)
    x_tile[1:sh[0] - 1, 0:1] = jnp.zeros((sh[0] - 2, 1) + sh[2:],
                                         x_tile.dtype)
    zw = jnp.zeros((sh[0] - 2, sh[1] - 1, 8, sh[3]), x_tile.dtype)
    x_tile[1:sh[0] - 1, 1:, 0:8] = zw
    x_tile[1:sh[0] - 1, 1:, sh[2] - 8:] = zw


def _x2_io(x_hbm, x_tile, sem, b, ti, hi, tt, ht, wx, n_t, n_h, phases):
    """Start and/or wait the x2-window copies (see pairs below); ``phases``
    is a subset of ("start", "wait")."""
    t0, h0 = ti * tt, hi * ht

    def mk(src, dst):
        return pltpu.make_async_copy(src, dst, sem)

    def pairs():
        yield None, (x_hbm.at[b, pl.ds(t0, tt), pl.ds(2 * h0, 2 * ht), :, :],
                     x_tile.at[pl.ds(1, tt), pl.ds(1, 2 * ht),
                               pl.ds(8, wx), :])
        yield hi > 0, (x_hbm.at[b, pl.ds(t0, tt), pl.ds(2 * h0 - 1, 1), :, :],
                       x_tile.at[pl.ds(1, tt), pl.ds(0, 1), pl.ds(8, wx), :])
        yield ti > 0, (x_hbm.at[b, pl.ds(t0 - 1, 1),
                                pl.ds(2 * h0, 2 * ht), :, :],
                       x_tile.at[pl.ds(0, 1), pl.ds(1, 2 * ht),
                                 pl.ds(8, wx), :])
        yield jnp.logical_and(ti > 0, hi > 0), (
            x_hbm.at[b, pl.ds(t0 - 1, 1), pl.ds(2 * h0 - 1, 1), :, :],
            x_tile.at[pl.ds(0, 1), pl.ds(0, 1), pl.ds(8, wx), :])
        yield ti < n_t - 1, (x_hbm.at[b, pl.ds(t0 + tt, 1),
                                      pl.ds(2 * h0, 2 * ht), :, :],
                             x_tile.at[pl.ds(tt + 1, 1), pl.ds(1, 2 * ht),
                                       pl.ds(8, wx), :])
        yield jnp.logical_and(ti < n_t - 1, hi > 0), (
            x_hbm.at[b, pl.ds(t0 + tt, 1), pl.ds(2 * h0 - 1, 1), :, :],
            x_tile.at[pl.ds(tt + 1, 1), pl.ds(0, 1), pl.ds(8, wx), :])

    # start everything, then wait — the DMA engines overlap the transfers
    for phase in phases:
        for cond, (src, dst) in pairs():
            if cond is None:
                getattr(mk(src, dst), phase)()
            else:
                @pl.when(cond)
                def _(src=src, dst=dst, phase=phase):
                    getattr(mk(src, dst), phase)()


def _load_x2_tile(x_hbm, x_tile, sem, b, ti, hi, tt, ht, wx, n_t, n_h):
    """Load the full-res x window backing half-res block rows
    [hi*ht, hi*ht+ht): x tile row j holds x block ``2*hi*ht - 1 + j`` (j=0
    is the above-halo row needed by the dy=0 taps), with T halo ±1."""
    _zero_frame_x2(x_tile)
    _x2_io(x_hbm, x_tile, sem, b, ti, hi, tt, ht, wx, n_t, n_h,
           ("start", "wait"))


def _fwd_s2_direct_kernel(*args, tt, ht, w2, lanes, p, n_t, n_h, n_b,
                          interpret, act=False, mm=False):
    """Stride-(1,2,2) forward computing ONLY the kept quarter of positions:
    y[t,m,n] = Σ w[dt,dy,dxx]·x[t+dt-1, 2m+dy-1, 2n+dxx-1] — the full-res
    stencil + fused subsample wastes 4x the (VPU-bound) tap MACs."""
    if mm:
        w_ref, wmm_ref, sc_ref, bi_ref, x_hbm, o_ref, x_tiles, a_tile, sem2 \
            = args
    elif act:
        w_ref, sc_ref, bi_ref, x_hbm, o_ref, x_tiles, sem2 = args
    else:
        w_ref, x_hbm, o_ref, x_tiles, sem2 = args
    b, ti, hi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    g_idx = (b * n_t + ti) * n_h + hi
    x_tile = _prefetch_pipeline(
        g_idx, n_b, n_t, n_h, x_tiles, sem2, _zero_frame_x2,
        lambda tile, sm, b2, t2, h2, ph: _x2_io(
            x_hbm, tile, sm, b2, t2, h2, tt, ht, 2 * w2, n_t, n_h, ph))
    if mm:
        _mm_act_tile(x_tile, a_tile, wmm_ref, sc_ref, bi_ref, ti, hi,
                     n_t, n_h, 2 * w2, has_bottom_halo=False)
        x_tile = a_tile
    elif act:
        _act_tile(x_tile, sc_ref, bi_ref, ti, hi, n_t, n_h, 2 * w2,
                  has_bottom_halo=False)

    for z in range(ht):
        slabs = {d: x_tile[:, 2 * z + d, :, :] for d in range(3)}
        acc = jnp.zeros((tt, w2, lanes), F32)
        for dy in range(3):
            arr = _slot_select(_WG_PICKS[dy], slabs, p, lanes, interpret)
            even, odd = _deinterleave_w(arr, interpret)
            even, odd = even.astype(F32), odd.astype(F32)
            for dt in range(3):
                ev = even[dt:dt + tt]
                od = odd[dt:dt + tt]
                base = (dt * 3 + dy) * 3
                acc += od[:, 3:3 + w2, :] * w_ref[base, :][None, None, :]
                acc += ev[:, 4:4 + w2, :] * w_ref[base + 1, :][None, None, :]
                acc += od[:, 4:4 + w2, :] * w_ref[base + 2, :][None, None, :]
        o_ref[0, :, z, :, :] = acc.astype(o_ref.dtype)


def _fwd_s2_direct_pcall(x: jax.Array, w_lane: jax.Array, interpret: bool,
                         sc=None, bi=None, wmm=None) -> jax.Array:
    b, t, hb, w, lanes_in = x.shape
    lanes = wmm.shape[1] if wmm is not None else lanes_in
    hb2, w2 = hb // 2, w // 2
    p = lanes // FOLD
    act = sc is not None
    mm = wmm is not None
    tt, ht = _pick_tiles_s2(t, hb2, w2, lanes_in, x.dtype.itemsize,
                            mm_lanes=lanes if mm else 0)
    n_t, n_h = t // tt, hb2 // ht
    kernel = functools.partial(
        _fwd_s2_direct_kernel, tt=tt, ht=ht, w2=w2, lanes=lanes, p=p,
        n_t=n_t, n_h=n_h, n_b=b, interpret=interpret, act=act, mm=mm)
    if mm:
        ops = (w_lane, wmm, sc, bi, x)
    elif act:
        ops = (w_lane, sc, bi, x)
    else:
        ops = (w_lane, x)
    a_scr = ([pltpu.VMEM((tt + 2, 2 * ht + 1, w + 16, lanes), x.dtype)]
             if mm else [])
    return pl.pallas_call(
        kernel,
        grid=(b, n_t, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(ops) - 1) + [
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, tt, ht, w2, lanes),
                               lambda bi, ti, hi: (bi, ti, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, hb2, w2, lanes), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 2, 2 * ht + 1, w + 16, lanes_in), x.dtype),
            *a_scr,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ops)


def _wgrad_s2_kernel(*args, tt, ht, w2, lanes, p, n_t, n_h, n_b, interpret,
                     act=False, mm=False):
    if mm:
        (wmm_ref, sc_ref, bi_ref, x_hbm, g_hbm, o_ref, x_tiles, g_tiles,
         a_tile, xsem, gsem) = args
    elif act:
        sc_ref, bi_ref, x_hbm, g_hbm, o_ref, x_tiles, g_tiles, xsem, gsem \
            = args
    else:
        x_hbm, g_hbm, o_ref, x_tiles, g_tiles, xsem, gsem = args
    b, ti, hi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    g_idx = (b * n_t + ti) * n_h + hi

    @pl.when(g_idx == 0)
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)

    def g_io(tile, sm, b2, t2, h2, phases):
        d = pltpu.make_async_copy(
            g_hbm.at[b2, pl.ds(t2 * tt, tt), pl.ds(h2 * ht, ht), :, :],
            tile, sm)
        if "start" in phases:
            d.start()
        if "wait" in phases:
            d.wait()

    x_tile = _prefetch_pipeline(
        g_idx, n_b, n_t, n_h, x_tiles, xsem, _zero_frame_x2,
        lambda tile, sm, b2, t2, h2, ph: _x2_io(
            x_hbm, tile, sm, b2, t2, h2, tt, ht, 2 * w2, n_t, n_h, ph))
    g_tile = _prefetch_pipeline(
        g_idx, n_b, n_t, n_h, g_tiles, gsem, lambda t: None, g_io)
    if mm:
        _mm_act_tile(x_tile, a_tile, wmm_ref, sc_ref, bi_ref, ti, hi,
                     n_t, n_h, 2 * w2, has_bottom_halo=False)
        x_tile = a_tile
    elif act:
        _act_tile(x_tile, sc_ref, bi_ref, ti, hi, n_t, n_h, 2 * w2,
                  has_bottom_halo=False)

    for z in range(ht):
        gs = g_tile[:, z, :, :].astype(F32)           # (tt, w2, L)
        slabs = {d: x_tile[:, 2 * z + d, :, :] for d in range(3)}
        for dy in range(3):
            arr = _slot_select(_WG_PICKS[dy], slabs, p, lanes, interpret)
            even, odd = _deinterleave_w(arr, interpret)  # (tt+2, w2+8, L)
            even, odd = even.astype(F32), odd.astype(F32)
            for dt in range(3):
                ev = even[dt:dt + tt]
                od = odd[dt:dt + tt]
                base = (dt * 3 + dy) * 3
                o_ref[base, :] += jnp.sum(gs * od[:, 3:3 + w2, :],
                                          axis=(0, 1))
                o_ref[base + 1, :] += jnp.sum(gs * ev[:, 4:4 + w2, :],
                                              axis=(0, 1))
                o_ref[base + 2, :] += jnp.sum(gs * od[:, 4:4 + w2, :],
                                              axis=(0, 1))


def _pick_tiles_s2(t: int, hb2: int, w2: int, lanes: int,
                   itemsize: int, mm_lanes: int = 0) -> Tuple[int, int]:
    """Tiles for the s2 backward kernels (grid over the half-res g)."""
    budget = 10 * 1024 * 1024
    best = (1, 1)
    best_cost = None
    for ht in (hb2, 14, 7, 4, 2, 1):
        if ht > hb2 or hb2 % ht:
            continue
        for tt in (8, 4, 2, 1):
            if t % tt:
                continue
            g_tile = ((tt + 2) * (ht + 2) * (w2 + 16)
                      * (mm_lanes or lanes) * itemsize)
            x_tile = (tt + 2) * (2 * ht + 1) * (2 * w2 + 16) * lanes * itemsize
            out2 = 2 * tt * 2 * ht * 2 * w2 * (mm_lanes or lanes) * itemsize
            acc = tt * w2 * (mm_lanes or lanes) * 4 * 2
            mm = ((tt + 2) * (2 * ht + 1) * (2 * w2 + 16)
                  * mm_lanes * (itemsize + 4))
            if g_tile + x_tile + out2 + acc + mm >= budget:
                continue
            halo = ((tt + 2) * (ht + 2)) / (tt * ht)
            if best_cost is None or halo < best_cost:
                best, best_cost = (tt, ht), halo
    return best


def _dx_s2_pcall(g: jax.Array, w_lane: jax.Array, interpret: bool
                 ) -> jax.Array:
    b, t, hb2, w2, lanes = g.shape
    p = lanes // FOLD
    tt, ht = _pick_tiles_s2(t, hb2, w2, lanes, g.dtype.itemsize)
    n_t, n_h = t // tt, hb2 // ht
    kernel = functools.partial(
        _dx_s2_kernel, tt=tt, ht=ht, w2=w2, lanes=lanes, p=p, n_t=n_t,
        n_h=n_h, n_b=b, interpret=interpret)
    return pl.pallas_call(
        kernel,
        grid=(b, n_t, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, tt, 2 * ht, 2 * w2, lanes),
                               lambda bi, ti, hi: (bi, ti, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, 2 * hb2, 2 * w2, lanes),
                                       g.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 2, ht + 2, w2 + 16, lanes), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w_lane, g)


def _dx_s2_mask_pcall(g: jax.Array, w_lane: jax.Array, interpret: bool,
                      sc=None, bi=None, wmm=None, x2=None) -> jax.Array:
    """Stride-2 dx with the relu mask applied in-kernel (the s2 shape of
    :func:`_dx_mask_pcall`): ``g`` half-res cotangent, ``x2`` the full-res
    pre-matmul input; the masked full-res ``dam`` is the only HBM write."""
    b, t, hb2, w2, lanes = g.shape
    lanes_in = x2.shape[-1]
    p = lanes // FOLD
    tt, ht = _pick_tiles_s2(t, hb2, w2, lanes_in, g.dtype.itemsize,
                            mm_lanes=lanes)
    n_t, n_h = t // tt, hb2 // ht
    kernel = functools.partial(
        _dx_s2_kernel, tt=tt, ht=ht, w2=w2, lanes=lanes, p=p, n_t=n_t,
        n_h=n_h, n_b=b, interpret=interpret, mask=True)
    return pl.pallas_call(
        kernel,
        grid=(b, n_t, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 + [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, tt, 2 * ht, 2 * w2, lanes),
                               lambda bi, ti, hi: (bi, ti, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, 2 * hb2, 2 * w2, lanes),
                                       g.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 2, ht + 2, w2 + 16, lanes), g.dtype),
            pltpu.VMEM((2, tt + 2, 2 * ht + 1, 2 * w2 + 16, lanes_in),
                       x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w_lane, wmm, sc, bi, g, x2)


def _wgrad_s2_pcall(x: jax.Array, g: jax.Array, interpret: bool,
                    sc=None, bi=None, wmm=None) -> jax.Array:
    b, t, hb2, w2, lanes = g.shape
    lanes_in = x.shape[-1]
    p = lanes // FOLD
    act = sc is not None
    mm = wmm is not None
    tt, ht = _pick_tiles_s2(t, hb2, w2, lanes_in, g.dtype.itemsize,
                            mm_lanes=lanes if mm else 0)
    n_t, n_h = t // tt, hb2 // ht
    kernel = functools.partial(
        _wgrad_s2_kernel, tt=tt, ht=ht, w2=w2, lanes=lanes, p=p, n_t=n_t,
        n_h=n_h, n_b=b, interpret=interpret, act=act, mm=mm)
    if mm:
        ops = (wmm, sc, bi, x, g)
        vec = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    elif act:
        ops = (sc, bi, x, g)
        vec = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    else:
        ops = (x, g)
        vec = []
    a_scr = ([pltpu.VMEM((tt + 2, 2 * ht + 1, 2 * w2 + 16, lanes), x.dtype)]
             if mm else [])
    return pl.pallas_call(
        kernel,
        grid=(b, n_t, n_h),
        in_specs=[
            *vec,
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((27, lanes), lambda bi, ti, hi: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27, lanes), F32),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 2, 2 * ht + 1, 2 * w2 + 16, lanes_in),
                       x.dtype),
            pltpu.VMEM((2, tt, ht, w2, lanes), g.dtype),
            *a_scr,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ops)


# ---- SPMD batch partitioning ----------------------------------------------
#
# Under ``jit`` with batch-sharded operands (the data-parallel mesh,
# parallel/mesh.py) the SPMD partitioner treats a Mosaic custom-call
# conservatively: every operand is all-gathered and each device computes the
# FULL global batch.  The kernels are embarrassingly parallel over batch
# (grid axis 0), so each entry point is registered with a
# ``custom_partitioning`` rule: batch axis 0 shards through; the wgrad
# kernels' (27, lanes) tap sums are per-shard partials combined with a
# ``psum`` over the batch mesh axes.  The rules are Shardy-compatible
# (``sharding_rule`` strings) and fall back to the GSPMD callbacks.


def _sp_variants(kind: str):
    """(impl, out_batched, batch_argnums, sharding rules per mode)."""
    return {
        # x, w_lane [, (wmm,) sc, bi] -> y (fold4; lanes_out with mm)
        "fwd": (_dw_fold4_pcall, True, (0,), {
            "plain": "b t h w l, k l -> b t h w l",
            "act": "b t h w l, k l, l, l -> b t h w l",
            "mm": "b t h w i, k o, i o, o, o -> b t h w o"}),
        # x, g [, (wmm,) sc, bi] -> (27, lanes) tap sums (reduced over batch)
        "wgrad": (_dw_fold4_wgrad_pcall, False, (0, 1), {
            "plain": "b t h w l, b t h w l -> k l",
            "act": "b t h w l, b t h w l, l, l -> k l",
            "mm": "b t h w i, b t h w o, i o, o, o -> k o"}),
        # g, w_lane_flip, wmm, sc, bi, x2 -> masked dx (both g and x2
        # batched; the mask is recomputed in-kernel from x2)
        "dx_mask": (_dx_mask_pcall, True, (0, 5), {
            "mm_x": "b t h w o, k o, i o, o, o, b t h w i -> b t h w o"}),
        # x full-res, w_lane -> y at (hb/2, w/2)
        "fwd_s2": (_fwd_s2_direct_pcall, True, (0,), {
            "plain": "b t h w l, k l -> b t y j l",
            "act": "b t h w l, k l, l, l -> b t y j l",
            "mm": "b t h w i, k o, i o, o, o -> b t y j o"}),
        # g half-res, w_lane -> dx full-res
        "dx_s2": (_dx_s2_pcall, True, (0,), {
            "plain": "b t h w l, k l -> b t y j l"}),
        # g half-res, w_lane, wmm, sc, bi, x2 full-res -> masked dx full-res
        "dx_s2_mask": (_dx_s2_mask_pcall, True, (0, 5), {
            "mm_x": "b t h w o, k o, i o, o, o, b t y j i -> b t y j o"}),
        # g, w_lane_flip, sc, bi, x2(BN input) -> (dam*sc, per-batch
        # (dsc, dbi) partials) — the act path's whole backward epilogue
        "dx_act": (_dx_act_pcall, True, (0, 4), {
            "act_x": "b t h w l, k l, l, l, b t h w l -> b t h w l, b r l"}),
        "dx_s2_act": (_dx_s2_act_pcall, True, (0, 4), {
            "act_x": "b t h w l, k l, l, l, b t y j l -> b t y j l, b r l"}),
        # x full-res, g half-res -> (27, lanes) tap sums
        "wgrad_s2": (_wgrad_s2_pcall, False, (0, 1), {
            "plain": "b t h w l, b t y j l -> k l",
            "act": "b t h w l, b t y j l, l, l -> k l",
            "mm": "b t h w i, b t y j o, i o, o, o -> k o"}),
    }[kind]


@functools.lru_cache(maxsize=None)
def _sp_kernel(kind: str, mode: str, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    impl, out_batched, batch_args, rules = _sp_variants(kind)
    rule = rules[mode]

    if mode == "mm_x":
        def fn(a0, a1, wmm, sc, bi, x2):
            return impl(a0, a1, interpret, sc=sc, bi=bi, wmm=wmm, x2=x2)
    elif mode == "act_x":
        def fn(a0, a1, sc, bi, x2):
            return impl(a0, a1, interpret, sc=sc, bi=bi, x2=x2)
    elif mode == "mm":
        def fn(a0, a1, wmm, sc, bi):
            return impl(a0, a1, interpret, sc=sc, bi=bi, wmm=wmm)
    elif mode == "act":
        def fn(a0, a1, sc, bi):
            return impl(a0, a1, interpret, sc=sc, bi=bi)
    else:
        def fn(a0, a1):
            return impl(a0, a1, interpret)

    cp = custom_partitioning(fn)

    def _batch_axes(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def _out_shardings(mesh, ax, result_shape):
        sh = NamedSharding(mesh, PartitionSpec(ax) if ax is not None
                           else PartitionSpec())
        if isinstance(result_shape, (tuple, list)):
            return type(result_shape)(sh for _ in result_shape)
        return sh

    def infer(mesh, arg_shapes, result_shape):
        ax = _batch_axes(arg_shapes) if out_batched else None
        return _out_shardings(mesh, ax, result_shape)

    def partition(mesh, arg_shapes, result_shape):
        ax = _batch_axes(arg_shapes)
        arg_sh = tuple(
            NamedSharding(mesh, PartitionSpec(ax)
                          if (i in batch_args and ax is not None)
                          else PartitionSpec())
            for i in range(len(arg_shapes)))
        out_sh = _out_shardings(mesh, ax if out_batched else None,
                                result_shape)

        def lower(*args):
            out = fn(*args)
            if not out_batched and ax is not None:
                out = jax.lax.psum(out, ax)
            return out

        return mesh, lower, out_sh, arg_sh

    # special factors must be listed in factor-index (first-appearance) order
    seen: list = []
    for f in rule:
        if f.isalpha() and f != "b" and f not in seen:
            seen.append(f)
    factors = seen
    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        reduction_factors=() if out_batched else ("b",),
        need_replication_factors=tuple(factors),
    )
    return cp


def _dw_fold4_raw(x, w_lane, interpret, sc=None, bi=None, wmm=None):
    if wmm is not None:
        return _sp_kernel("fwd", "mm", interpret)(x, w_lane, wmm, sc, bi)
    if sc is not None:
        return _sp_kernel("fwd", "act", interpret)(x, w_lane, sc, bi)
    return _sp_kernel("fwd", "plain", interpret)(x, w_lane)


def _dw_fold4_wgrad_raw(x, g, interpret, sc=None, bi=None, wmm=None):
    if wmm is not None:
        return _sp_kernel("wgrad", "mm", interpret)(x, g, wmm, sc, bi)
    if sc is not None:
        return _sp_kernel("wgrad", "act", interpret)(x, g, sc, bi)
    return _sp_kernel("wgrad", "plain", interpret)(x, g)


def _fwd_s2_direct_raw(x, w_lane, interpret, sc=None, bi=None, wmm=None):
    if wmm is not None:
        return _sp_kernel("fwd_s2", "mm", interpret)(x, w_lane, wmm, sc, bi)
    if sc is not None:
        return _sp_kernel("fwd_s2", "act", interpret)(x, w_lane, sc, bi)
    return _sp_kernel("fwd_s2", "plain", interpret)(x, w_lane)


def _dx_mask_raw(g, w_lane, interpret, sc=None, bi=None, wmm=None, x2=None):
    return _sp_kernel("dx_mask", "mm_x", interpret)(g, w_lane, wmm, sc, bi,
                                                    x2)


def _dx_s2_raw(g, w_lane, interpret):
    return _sp_kernel("dx_s2", "plain", interpret)(g, w_lane)


def _dx_s2_mask_raw(g, w_lane, interpret, sc=None, bi=None, wmm=None,
                    x2=None):
    return _sp_kernel("dx_s2_mask", "mm_x", interpret)(g, w_lane, wmm, sc,
                                                       bi, x2)


def _dx_act_raw(g, w_lane, interpret, sc=None, bi=None, x2=None):
    return _sp_kernel("dx_act", "act_x", interpret)(g, w_lane, sc, bi, x2)


def _dx_s2_act_raw(g, w_lane, interpret, sc=None, bi=None, x2=None):
    return _sp_kernel("dx_s2_act", "act_x", interpret)(g, w_lane, sc, bi, x2)


def _wgrad_s2_raw(x, g, interpret, sc=None, bi=None, wmm=None):
    if wmm is not None:
        return _sp_kernel("wgrad_s2", "mm", interpret)(x, g, wmm, sc, bi)
    if sc is not None:
        return _sp_kernel("wgrad_s2", "act", interpret)(x, g, sc, bi)
    return _sp_kernel("wgrad_s2", "plain", interpret)(x, g)


def _zero_upsample_fold(g: jax.Array) -> jax.Array:
    """Inverse placement of the stride-2 subsample, in fold space: output
    rows 2y' / cols 2x' get ``g``, the rest zeros (the subsample's VJP)."""
    b, t, hb, w2, l = g.shape
    p = l // FOLD
    gv = g.reshape(b, t, hb, w2, FOLD, p)
    z = jnp.zeros_like(gv[..., :1, :])
    blk0 = jnp.concatenate([gv[..., 0:1, :], z, gv[..., 1:2, :], z], axis=-2)
    blk1 = jnp.concatenate([gv[..., 2:3, :], z, gv[..., 3:4, :], z], axis=-2)
    gy = jnp.stack([blk0, blk1], axis=3)           # (b,t,hb,2,w2,4,p)
    gy = gy.reshape(b, t, 2 * hb, w2, FOLD * p)
    gw = jnp.stack([gy, jnp.zeros_like(gy)], axis=4)
    return gw.reshape(b, t, 2 * hb, 2 * w2, FOLD * p)


def _stride2_via_full(x, w, c, interpret):
    """Fallback: full-resolution stride-1 stencil + XLA fold-space subsample
    (used for compiled f32, which has no sublane-pair bitcast)."""
    y = dw_fold4(x, w, c, interpret)
    b, t, hb, wd, l = y.shape
    p = l // FOLD
    yv = y.reshape(b, t, hb, wd // 2, 2, FOLD, p)[:, :, :, :, 0, ::2, :]
    yv = jnp.moveaxis(yv, 4, 3)          # (b,t,hb,2,W/2,P)
    return refold_y2_to_y4(yv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dw_fold4_stride2(x: jax.Array, w: jax.Array, c: int,
                     interpret: bool = False) -> jax.Array:
    """Depthwise 3x3x3 with stride (1,2,2) on fold4 (layer-N block0,
    ``x3d_fine.py:93,104``): computes only the kept quarter of positions
    (:func:`_fwd_s2_direct_kernel`) — the stencil is VPU-bound, so skipping
    the discarded taps is a ~4x MAC saving over stencil+subsample.

    Compiled direct-quarter dispatch needs bf16 AND
    :func:`fold_s2_supported` shapes (the half-res backward's g tile
    width ``w/2 + 16`` must be 8-aligned — Mosaic rejects the slice
    otherwise); everything else takes the exact full-res + subsample
    route."""
    if (x.dtype == jnp.bfloat16 and fold_s2_supported(x.shape)) or interpret:
        p = x.shape[-1] // FOLD
        return _fwd_s2_direct_raw(x, _prep_lane_weights(w, c, p), interpret)
    return _stride2_via_full(x, w, c, interpret)


def _dw_s2_fwd(x, w, c, interpret):
    return dw_fold4_stride2(x, w, c, interpret), (x, w)


def _dw_s2_bwd(c, interpret, res, g):
    """Dedicated half-res backward (see the s2-kernel section): dx and dk
    read g at stride-2 resolution directly instead of zero-upsampling it to
    full resolution and paying three full-res passes.  Compiled f32 falls
    back to the upsample route (no bf16 sublane-pair bitcast there)."""
    x, w = res
    p = x.shape[-1] // FOLD
    if (x.dtype == jnp.bfloat16 and fold_s2_supported(x.shape)) or interpret:
        dx = _dx_s2_raw(g, _prep_lane_weights(w, c, p), interpret)
        dk_lane = _wgrad_s2_raw(x, g, interpret)
    else:
        g_full = _zero_upsample_fold(g).astype(x.dtype)
        w_flip = jnp.flip(w, axis=(0, 1, 2))
        dx = _dw_fold4_raw(g_full, _prep_lane_weights(w_flip, c, p),
                           interpret)
        dk_lane = _dw_fold4_wgrad_raw(x, g_full, interpret)
    dk = dk_lane.reshape(27, FOLD, p).sum(axis=1)[:, :c]
    dk = dk.reshape(3, 3, 3, 1, c).astype(w.dtype)
    return dx, dk


dw_fold4_stride2.defvjp(_dw_s2_fwd, _dw_s2_bwd)


def fold_s2_supported(shape) -> bool:
    """Compiled stride-2 kernel constraints: W halves must stay 8-aligned for
    the DMA sublane slices, block rows must pair, and the lane roll's u32
    bitcast needs even sublane counts (all true at the real trunk shapes)."""
    _, t, hb, w, _ = shape
    return hb % 2 == 0 and w % 16 == 0 and (w // 2) % 8 == 0 and t >= 1


def fold_dw_conv3d(x: jax.Array, w: jax.Array, c: int,
                   stride: int = 1, impl: str = "auto") -> jax.Array:
    """Dispatcher for the fold4 depthwise conv.

    impl: 'pallas' (TPU kernel), 'interpret' (kernel under the Pallas
    interpreter — CPU testing), 'sandwich' (unfold → XLA conv → refold), or
    'auto' (pallas on TPU, sandwich elsewhere).
    """
    if impl == "auto":
        impl = "mixed" if jax.default_backend() == "tpu" else "sandwich"
    if impl == "mixed":
        # stride-1 stencil when W is DMA-sublane-aligned; stride-2 uses the
        # direct-quarter forward + dedicated half-res backward kernels where
        # the shape qualifies
        if stride == 1:
            ok = x.shape[3] % 8 == 0
        else:
            ok = x.dtype == jnp.bfloat16 and fold_s2_supported(x.shape)
        impl = "pallas" if ok else "sandwich"
    if impl in ("pallas", "interpret"):
        interpret = impl == "interpret"
        if stride == 1:
            return dw_fold4(x, w, c, interpret)
        assert stride == 2, stride
        return dw_fold4_stride2(x, w, c, interpret)
    # sandwich fallback (exact; slower — keeps CPU/odd shapes working).
    # impl="lax": in-model XLA fuses its conv with the relayouts best
    # (round-1 finding; the round-1 Pallas stencil also VMEM-OOMs here).
    from .dw_conv import depthwise_conv3d

    y = from_fold4(x, c)
    y = depthwise_conv3d(y, w.astype(y.dtype), (1, stride, stride),
                         impl="lax")
    return to_fold4(y, fold_pad(c))


# ---- fused BN-apply + ReLU + depthwise conv --------------------------------
#
# y = dw_conv(relu(x*sc + bi)) with sc/bi per-lane f32 vectors (pad lanes
# zero).  The activation is applied to each loaded tile inside the forward
# and wgrad kernels — the separately-materialised bn1 apply pass (and the
# layout copies XLA inserts around it next to the custom-calls) disappears.
# Backward w.r.t. (x, sc, bi) is one fused XLA elementwise+reduce pass over
# (da, x); da comes from the existing dx kernels.


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def dw_fold4_act(x: jax.Array, w: jax.Array, sc: jax.Array, bi: jax.Array,
                 c: int, stride: int = 1, interpret: bool = False
                 ) -> jax.Array:
    p = x.shape[-1] // FOLD
    w_lane = _prep_lane_weights(w, c, p)
    if stride == 1:
        return _dw_fold4_raw(x, w_lane, interpret, sc=sc, bi=bi)
    return _fwd_s2_direct_raw(x, w_lane, interpret, sc=sc, bi=bi)


def _dw_act_fwd(x, w, sc, bi, c, stride, interpret):
    return dw_fold4_act(x, w, sc, bi, c, stride, interpret), (x, w, sc, bi)


def _dw_act_bwd(c, stride, interpret, res, g):
    x, w, sc, bi = res
    p = x.shape[-1] // FOLD
    if os.environ.get("CFN_ACT_DX_KERNEL", "1") != "0":
        # the whole backward epilogue runs inside the dx kernel: relu' from
        # the materialised BN input (elementwise), dam·sc as the output and
        # per-batch (dsc, dbi) partials — da never round-trips HBM (the
        # XLA-level epilogue materialised da, then a second pass re-read x
        # and da to mask/scale/reduce)
        if stride == 1:
            w_flip = jnp.flip(w, axis=(0, 1, 2))
            dx, red = _dx_act_raw(g, _prep_lane_weights(w_flip, c, p),
                                  interpret, sc=sc, bi=bi, x2=x)
            dk_lane = _dw_fold4_wgrad_raw(x, g, interpret, sc=sc, bi=bi)
        else:
            dx, red = _dx_s2_act_raw(g, _prep_lane_weights(w, c, p),
                                     interpret, sc=sc, bi=bi, x2=x)
            dk_lane = _wgrad_s2_raw(x, g, interpret, sc=sc, bi=bi)
        dk = dk_lane.reshape(27, FOLD, p).sum(axis=1)[:, :c]
        dk = dk.reshape(3, 3, 3, 1, c).astype(w.dtype)
        red = red.sum(axis=0)                      # (2, lanes)
        return dx, dk, red[0], red[1]
    if stride == 1:
        w_flip = jnp.flip(w, axis=(0, 1, 2))
        da = _dw_fold4_raw(g, _prep_lane_weights(w_flip, c, p), interpret)
        dk_lane = _dw_fold4_wgrad_raw(x, g, interpret, sc=sc, bi=bi)
    else:
        da = _dx_s2_raw(g, _prep_lane_weights(w, c, p), interpret)
        dk_lane = _wgrad_s2_raw(x, g, interpret, sc=sc, bi=bi)
    dk = dk_lane.reshape(27, FOLD, p).sum(axis=1)[:, :c]
    dk = dk.reshape(3, 3, 3, 1, c).astype(w.dtype)
    # one fused elementwise+reduce pass: mask from the pre-activation
    xf = x.astype(F32)
    m = (xf * sc + bi) > 0
    dam = jnp.where(m, da.astype(F32), 0.0)
    dx = (dam * sc).astype(x.dtype)
    dsc = jnp.sum(dam * xf, axis=(0, 1, 2, 3))
    dbi = jnp.sum(dam, axis=(0, 1, 2, 3))
    return dx, dk, dsc, dbi


dw_fold4_act.defvjp(_dw_act_fwd, _dw_act_bwd)


def fold_dw_bnrelu_conv3d(x: jax.Array, w: jax.Array, sc: jax.Array,
                          bi: jax.Array, c: int, stride: int = 1,
                          impl: str = "auto") -> jax.Array:
    """Dispatcher for the fused bn-apply+relu+depthwise conv.

    Same impl semantics as :func:`fold_dw_conv3d`; non-kernel paths apply the
    activation with XLA and fall through to the unfused conv (identical
    math)."""
    if impl == "auto":
        impl = "mixed" if jax.default_backend() == "tpu" else "sandwich"
    if impl == "mixed":
        if stride == 1:
            ok = x.shape[3] % 8 == 0
        else:
            ok = x.dtype == jnp.bfloat16 and fold_s2_supported(x.shape)
        impl = "pallas" if ok else "sandwich"
    if impl in ("pallas", "interpret"):
        return dw_fold4_act(x, w, sc, bi, c, stride, impl == "interpret")
    a = jnp.maximum(x.astype(F32) * sc + bi, 0.0).astype(x.dtype)
    return fold_dw_conv3d(a, w, c, stride=stride, impl=impl)


# ---- fused pointwise-matmul + BN-apply + ReLU + depthwise conv --------------
#
# y = dw_conv(relu((x @ wmm)*sc + bi)) — the bottleneck's conv1 (block-
# diagonal fold matmul, ``x3d_fine.py:85-88``) runs on the MXU *inside* the
# stencil kernels' tile pass (:func:`_mm_act_tile`), so the expanded c_mid
# tensor never round-trips HBM: the stencil reads x at lanes_in (2x narrower
# at every bottleneck: C_in=24 vs C_mid=54) and the separately-materialised
# conv1 output + the layout copies XLA inserts around it disappear.
#
# Backward: da comes from the existing dx kernels (at lanes_out); dk from the
# mm-wgrad kernels (which recompute the activated tile in VMEM); the
# (dx, dwmm, dsc, dbi) chain recomputes the pointwise product once with XLA
# matmuls (MXU-bound, fused with the relu mask).


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def dw_fold4_mm_act(x: jax.Array, wmm: jax.Array, w: jax.Array,
                    sc: jax.Array, bi: jax.Array, c: int, stride: int = 1,
                    interpret: bool = False) -> jax.Array:
    """``dw_conv3x3x3(relu((x @ wmm) * sc + bi))`` on fold4 tensors.

    Args:
      x: (B, T, H/4, W, 4P_in) fold4 tensor.
      wmm: (4P_in, 4P_out) block-diagonal folded pointwise matrix
        (:func:`...ops.fold.fold_pointwise_kernel`).
      w: canonical depthwise kernel (3, 3, 3, 1, C), C <= P_out.
      sc/bi: per-lane f32 BN-apply vectors at 4P_out (pad lanes zero).
    """
    p = wmm.shape[1] // FOLD
    w_lane = _prep_lane_weights(w, c, p)
    if stride == 1:
        return _dw_fold4_raw(x, w_lane, interpret, sc=sc, bi=bi, wmm=wmm)
    return _fwd_s2_direct_raw(x, w_lane, interpret, sc=sc, bi=bi, wmm=wmm)


def _dw_mm_fwd(x, wmm, w, sc, bi, c, stride, interpret):
    out = dw_fold4_mm_act(x, wmm, w, sc, bi, c, stride, interpret)
    return out, (x, wmm, w, sc, bi)


def _dw_mm_bwd(c, stride, interpret, res, g):
    x, wmm, w, sc, bi = res
    p = wmm.shape[1] // FOLD
    if stride == 1:
        w_flip = jnp.flip(w, axis=(0, 1, 2))
        da = _dw_fold4_raw(g, _prep_lane_weights(w_flip, c, p), interpret)
        dk_lane = _dw_fold4_wgrad_raw(x, g, interpret, sc=sc, bi=bi, wmm=wmm)
    else:
        da = _dx_s2_raw(g, _prep_lane_weights(w, c, p), interpret)
        dk_lane = _wgrad_s2_raw(x, g, interpret, sc=sc, bi=bi, wmm=wmm)
    dk = dk_lane.reshape(27, FOLD, p).sum(axis=1)[:, :c]
    dk = dk.reshape(3, 3, 3, 1, c).astype(w.dtype)
    # HBM-lean (dx, dwmm, dsc, dbi): the recomputed product feeds ONLY the
    # relu mask (one consumer → the epilogue fuses into the matmul, nothing
    # f32 full-res is materialised); ``dam`` stays in the compute dtype; sc
    # folds into the small matrices; and dsc uses the contraction identity
    #   Σ_pos dam·(xW) = Σ_i W_io (xᵀ dam)_io = ⟨W, G⟩_io
    # so the product is never re-read for the scale gradient.
    z_pos = (jnp.einsum("bthwi,io->bthwo", x, wmm,
                        preferred_element_type=F32) * sc + bi) > 0
    dam = jnp.where(z_pos, da, jnp.zeros((), da.dtype))
    w_sc = (wmm.astype(F32) * sc[None, :]).astype(x.dtype)
    dx = jnp.einsum("bthwo,io->bthwi", dam, w_sc,
                    preferred_element_type=F32).astype(x.dtype)
    gmat = jnp.einsum("bthwi,bthwo->io", x, dam,
                      preferred_element_type=F32)
    dwmm = (gmat * sc[None, :]).astype(wmm.dtype)
    dsc = jnp.einsum("io,io->o", wmm.astype(F32), gmat)
    dbi = jnp.sum(dam, axis=(0, 1, 2, 3), dtype=F32)
    return dx, dwmm, dk, dsc, dbi


dw_fold4_mm_act.defvjp(_dw_mm_fwd, _dw_mm_bwd)


def fold_dw_mm_bnrelu_conv3d(x: jax.Array, wmm: jax.Array, w: jax.Array,
                             sc: jax.Array, bi: jax.Array, c: int,
                             stride: int = 1, impl: str = "auto"
                             ) -> jax.Array:
    """Dispatcher for the fused matmul+bn-apply+relu+depthwise conv.

    Same impl semantics as :func:`fold_dw_conv3d`; non-kernel paths apply the
    pointwise conv with an XLA matmul and fall through to the fused-act conv
    (identical math)."""
    if impl == "auto":
        impl = "mixed" if jax.default_backend() == "tpu" else "sandwich"
    if impl == "mixed":
        if stride == 1:
            ok = x.shape[3] % 8 == 0
        else:
            ok = x.dtype == jnp.bfloat16 and fold_s2_supported(x.shape)
        impl = "pallas" if ok else "sandwich"
    if impl in ("pallas", "interpret"):
        return dw_fold4_mm_act(x, wmm, w, sc, bi, c, stride,
                               impl == "interpret")
    y = fold_matmul(x, wmm)
    return fold_dw_bnrelu_conv3d(y, w, sc, bi, c, stride=stride, impl=impl)


# ---- TRAIN-mode fused bottleneck entry --------------------------------------
#
# y = dw_conv(relu(BN_train(x @ wmm))) with BN *batch* statistics — the last
# unfused piece of the bottleneck entry in training.  Fusing only the forward
# (round-3 experiment) was a measured net loss because the stats and their
# cotangent went through autodiff: the Gram backward re-read and re-wrote the
# trunk tensor.  This composite spans matmul + train-stats + normalize + relu
# + stencil in ONE custom_vjp:
#
# * forward: channel moments from (Σx, xᵀx) via the lane identities
#   E[(xW)_o] = (E[x]W)_o and E[(xW)_o²] = (Wᵀ E[xxᵀ] W)_oo — the expanded
#   c_mid tensor is never materialised; then the matmul-fused stencil kernel.
# * backward: the closed-form BN gradient, rearranged so every stats
#   correction is small-matrix algebra.  With per-channel scalars
#   S1 = Σdam, S2 = r(Σ dam·z − μS1) and A = sc(rμS2 − S1)/N,
#   B = −sc·r·S2/N:
#       dz = sc·dam + A + B·z
#       dx = dam @ (W·sc)ᵀ + x @ (W diag(B) Wᵀ) + W @ A
#       dW = sc·(xᵀdam) + (Σx) ⊗ A + (xᵀx W) diag(B)
#   so the only full-tensor passes are the dx stencil kernel, one fused
#   mask-select producing dam, two MXU matmuls, and the wgrad kernel; the
#   xᵀx Gram and Σx are saved from the forward (Li², bytes).


def _mm_bn_stats(x, wmm, c, eps, gamma, beta):
    """Train-mode moments of ``x @ wmm`` without materialising the product;
    returns per-channel (mean, var, r) and per-lane (sc, bi) apply vectors,
    plus the (Σx, xᵀx, N) the closed-form backward reuses."""
    p = wmm.shape[1] // FOLD
    wf = wmm.astype(F32)
    # Gram on the original dtype (bf16 MXU rate, f32 accumulation)
    gram = jnp.einsum("bthwi,bthwj->ij", x, x, preferred_element_type=F32)
    s1 = jnp.sum(x, axis=(0, 1, 2, 3), dtype=F32)
    n = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3] * FOLD
    sz = s1 @ wf
    szz = jnp.einsum("io,ij,jo->o", wf, gram, wf, preferred_element_type=F32)
    pool = lambda v: v.reshape(FOLD, p).sum(axis=0)[:c]  # noqa: E731
    mean = pool(sz) / n
    var = jnp.maximum(pool(szz) / n - jnp.square(mean), 0.0)  # see layers.py: one-pass var can cancel negative
    r = jax.lax.rsqrt(var + eps)
    sc_c = gamma * r
    bi_c = beta - mean * sc_c
    return (mean, var, r, pad_vec(sc_c, c, p, 0.0),
            pad_vec(bi_c, c, p, 0.0), gram, s1, n)


def _mm_bn_train_primal(x, wmm, w, gamma, beta, c, stride, eps, interpret):
    mean, var, r, sc, bi, gram, s1, n = _mm_bn_stats(x, wmm, c, eps, gamma,
                                                     beta)
    p = wmm.shape[1] // FOLD
    w_lane = _prep_lane_weights(w, c, p)
    if stride == 1:
        y = _dw_fold4_raw(x, w_lane, interpret, sc=sc, bi=bi, wmm=wmm)
    else:
        y = _fwd_s2_direct_raw(x, w_lane, interpret, sc=sc, bi=bi, wmm=wmm)
    return y, mean, var, (r, sc, bi, gram, s1, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def dw_fold4_mm_bn_train(x: jax.Array, wmm: jax.Array, w: jax.Array,
                         gamma: jax.Array, beta: jax.Array, c: int,
                         stride: int = 1, eps: float = 1e-5,
                         interpret: bool = False):
    """``(y, mean, var)`` of ``dw_conv3x3x3(relu(BN_train(x @ wmm)))``.

    ``mean``/``var`` are the batch statistics (for the running-average
    update — they carry no gradient; the loss reaches them only through the
    normalized activations, which the custom backward handles in closed
    form).  Batch-global stats only (``SubBN num_splits == 1``)."""
    y, mean, var, _ = _mm_bn_train_primal(x, wmm, w, gamma, beta, c, stride,
                                          eps, interpret)
    return y, mean, var


def _mm_bn_train_fwd(x, wmm, w, gamma, beta, c, stride, eps, interpret):
    y, mean, var, aux = _mm_bn_train_primal(x, wmm, w, gamma, beta, c,
                                            stride, eps, interpret)
    r, sc, bi, gram, s1, n = aux
    return (y, mean, var), (x, wmm, w, gamma, mean, r, sc, bi, gram, s1, n)


def _mm_bn_train_bwd(c, stride, eps, interpret, res, cts):
    gy = cts[0]  # mean/var cotangents are structurally zero (running stats)
    x, wmm, w, gamma, mean, r, sc, bi, gram, s1, n = res
    p = wmm.shape[1] // FOLD
    if stride == 1:
        # masked dx in ONE kernel pass: neither da, the pred mask, nor the
        # recomputed product round-trips HBM (measured: the XLA-level
        # select materialised all three as separate full-res tensors)
        w_flip = jnp.flip(w, axis=(0, 1, 2))
        dam = _dx_mask_raw(gy, _prep_lane_weights(w_flip, c, p), interpret,
                           sc=sc, bi=bi, wmm=wmm, x2=x)
        dk_lane = _dw_fold4_wgrad_raw(x, gy, interpret, sc=sc, bi=bi, wmm=wmm)
    else:
        dam = _dx_s2_mask_raw(gy, _prep_lane_weights(w, c, p), interpret,
                              sc=sc, bi=bi, wmm=wmm, x2=x)
        dk_lane = _wgrad_s2_raw(x, gy, interpret, sc=sc, bi=bi, wmm=wmm)
    dk = dk_lane.reshape(27, FOLD, p).sum(axis=1)[:, :c]
    dk = dk.reshape(3, 3, 3, 1, c).astype(w.dtype)

    wf = wmm.astype(F32)
    s1d_l = jnp.sum(dam, axis=(0, 1, 2, 3), dtype=F32)
    gmat = jnp.einsum("bthwi,bthwo->io", x, dam, preferred_element_type=F32)
    tz_l = jnp.sum(wf * gmat, axis=0)          # Σ_pos dam_l·z_l = ⟨W, G⟩_l
    pool = lambda v: v.reshape(FOLD, p).sum(axis=0)[:c]  # noqa: E731
    s1d = pool(s1d_l)
    s2 = r * (pool(tz_l) - mean * s1d)
    dgamma = s2.astype(gamma.dtype)
    dbeta = s1d.astype(gamma.dtype)

    sc_c = gamma * r
    a_lane = pad_vec(sc_c * (r * mean * s2 - s1d) / n, c, p, 0.0)
    b_lane = pad_vec(-(sc_c * r * s2) / n, c, p, 0.0)

    w_sc = (wf * sc[None, :]).astype(x.dtype)
    m_corr = ((wf * b_lane[None, :]) @ wf.T).astype(x.dtype)
    v_corr = wf @ a_lane                                   # (Li,) f32
    dx = (jnp.einsum("bthwo,io->bthwi", dam, w_sc,
                     preferred_element_type=F32)
          + jnp.einsum("bthwi,ij->bthwj", x, m_corr,
                       preferred_element_type=F32)
          + v_corr).astype(x.dtype)
    dwmm = (gmat * sc[None, :] + s1[:, None] * a_lane[None, :]
            + (gram @ wf) * b_lane[None, :]).astype(wmm.dtype)
    return dx, dwmm, dk, dgamma, dbeta


dw_fold4_mm_bn_train.defvjp(_mm_bn_train_fwd, _mm_bn_train_bwd)


def resolve_mm_train_impl(x: jax.Array, stride: int, impl: str):
    """Resolve the train-composite dispatch: ``'pallas'`` / ``'interpret'``
    when the matmul-fused stencil kernels can run at this shape, else
    ``None`` (caller keeps the unfused matmul + stats + act-fused path).

    Compiled dispatch is OPT-IN (``CFN_MM_BN_TRAIN=1``; ``=s1`` restricts
    to stride-1 blocks): on v5e the composite measured a net LOSS at the
    bench config in every variant — 116.3 ms unfused vs 122.8 (XLA-select
    mask), 117.4 (s1 in-kernel mask), 118.9 ms (both strides in-kernel) —
    the in-kernel mask matmuls serialize with the VPU-bound tap loop even
    after program bytes reach parity (70.94 GB both ways); see PERF.md
    round-3b.  Explicit ``impl='interpret'`` always resolves (CPU tests)."""
    if impl == "interpret":
        return "interpret"
    knob = os.environ.get("CFN_MM_BN_TRAIN", "0")
    if knob == "0" or (knob == "s1" and stride != 1):
        return None
    if impl == "auto":
        impl = "mixed" if jax.default_backend() == "tpu" else "sandwich"
    if impl == "mixed":
        if stride == 1:
            ok = x.shape[3] % 8 == 0
        else:
            ok = x.dtype == jnp.bfloat16 and fold_s2_supported(x.shape)
        impl = "pallas" if ok else "sandwich"
    return impl if impl == "pallas" else None
