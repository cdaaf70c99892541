"""Pallas TPU kernel for semi-Lagrangian advection.

Why: the backtrace sample is a 2D gather, and XLA's TPU gather runs at
~120M points/s — it was ~70% of the whole step at 4096^2.  TPUs have no fast
arbitrary gather, but the backtrace displacement is physically bounded by the
CFL number; this kernel exploits that:

* the grid is tiled; each program DMAs its (tile + halo) window of the field
  from HBM into VMEM.  The halo covers ``max_disp + 1`` cells, rounded up to
  hardware tile multiples so every VMEM shape is aligned;
* the column component of the bilinear gather is ONE hardware op —
  ``tpu.dynamic_gather`` (``jnp.take_along_axis`` along lanes), the only
  arbitrary per-element gather the VPU has.  A full 2D per-element gather
  cannot be composed from two 1D gathers (the inner index field would be
  re-evaluated at gathered positions), so the row component is resolved by a
  short loop over the integer row shifts actually present;
* boundary semantics match the reference sampler (``advect.h:24-72``):
  clamped-coordinate multilinear interpolation == edge lerp, and the no-slip
  overshoot discount is computed from the *unclamped* coords and applied at
  the end.

Variants (an optimization lineage; "sloop" is the production path):

* ``sloop`` (default) — the panel kernel with the loop order swapped:
  shift slots OUTSIDE behind a tile-wide occupancy guard, panels inside
  behind their per-panel guards.  Guard machinery costs ~44 us per empty
  slot across a 4096^2 grid (measured round 4), and the swap cuts guard
  evaluations from ``panels * slots`` to ``slots + panels * active``;
  per-panel work and its ascending-shift accumulation order are unchanged,
  so results are bit-identical to "panel".
* ``panel`` — per-(output-panel, shift) occupancy skips: each 128-lane
  output panel reduces its own backtrace row-shift range and only runs the
  shifts present there (the velocity field is smooth, so a 128x128 panel
  typically spans 2-4 shifts while the whole tile spans 10-30).  The halo
  window is DMA'd at a 64-lane left offset so every output panel's column
  indices land in exactly TWO 128-lane source panels (the minimum — the
  index span is 128+2*max_disp+2 > 128 lanes).  For bfloat16 fields the
  two bilinear column taps come back in ONE hardware gather: adjacent bf16
  columns (k, k+1) are packed into one f32 lane (bf16 -> f32 widening is
  exact, so this path is bit-identical to gathering the bf16 values
  separately).  Weights/masks are computed once per (panel, shift) and
  shared across channels.
* ``tilewide`` — the round-1 kernel: tile-wide shift range, fully unrolled
  with ``pl.when`` skips, 3-panel gather band (``gather_utils``).
* ``dynamic`` — ``fori_loop`` over shifts with ``tpu.dynamic_rotate``.
  MISCOMPILES on real v5e silicon at some shapes (interpret mode and the AOT
  verifier do not catch it); kept only as a reproducer.  (A fori_loop with
  dynamic *sublane slices* instead of rotates fails to compile outright:
  Mosaic requires sublane starts provably divisible by 8.)

Displacements beyond ``max_disp`` cells are clamped (a CFL clamp — standard
practice; the pure-jnp path in ``ops.advect`` remains the unclamped
reference implementation and the small-grid default).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_utils import lane_gather
from .window import LANE_PAD, window_ops, issue, zero_skipped_strips

LANE = 128
_PANEL_LH = 64          # left lane halo of the DMA window (panel variant)


def _bitcast_u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _bitcast_f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _backtrace(vel_ref, row0, col0, *, dt, max_disp, tile_h, tile_w, h, w,
               no_slip, goff=None, bh=None, member=None):
    """Common backtrace coordinate math (advect.h:78-84).

    ``goff``: traced (or zero) global offset of this *block* — under
    ``shard_map`` each shard runs the kernel on its local block and the
    domain clamps/no-slip tests need global coordinates.

    ``member``: static (mh, mw) — tiled-domain mode (BASELINE config 4):
    every domain clamp / no-slip test acts per (mh, mw) member tile of the
    supergrid instead of the whole grid.

    Returns (i0-rel row shift, row-lerp weights, global float col of the
    left bilinear tap, col frac, row_valid mask, no-slip factor or None).
    """
    f32 = jnp.float32
    i_loc = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 0).astype(f32)
    j_loc = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 1).astype(f32)
    if goff is None:
        i_glob = i_loc + f32(row0)
        j_glob = j_loc + f32(col0)
    else:
        i_glob = i_loc + f32(row0) + goff[0].astype(f32)
        j_glob = j_loc + f32(col0) + goff[1].astype(f32)
    v0 = vel_ref[0].astype(f32)
    v1 = vel_ref[1].astype(f32)
    si_raw = i_glob - v0 * f32(dt)
    sj_raw = j_glob - v1 * f32(dt)

    if member is None:
        lo_i = f32(0.0)
        lo_j = f32(0.0)
        mh, mw = h, w
    else:
        # member-tile origins (exact: integer-valued f32 below 2^24).  For
        # power-of-two members the float divide+floor (slow on the VPU —
        # ~1.3 ms of the member dye advect at 4096^2, round-5 measurement)
        # becomes one integer mask on the int32 coordinate iotas.
        mh, mw = member

        def origin(glob_f32, m):
            if m & (m - 1) == 0:
                return (glob_f32.astype(jnp.int32)
                        & jnp.int32(~(m - 1))).astype(f32)
            return jnp.floor(glob_f32 / m) * m

        lo_i = origin(i_glob, mh)
        lo_j = origin(j_glob, mw)

    # CFL clamp to the halo radius, then the reference's domain clamp
    # (edge-collapse sampling, advect.h:44-55) — per member in tiled mode.
    si = jnp.clip(si_raw, i_glob - max_disp, i_glob + max_disp)
    sj = jnp.clip(sj_raw, j_glob - max_disp, j_glob + max_disp)
    si = jnp.clip(si, lo_i, lo_i + f32(mh - 1))
    sj = jnp.clip(sj, lo_j, lo_j + f32(mw - 1))
    i0 = jnp.clip(jnp.floor(si), lo_i, lo_i + f32(mh - 2))
    j0 = jnp.clip(jnp.floor(sj), lo_j, lo_j + f32(mw - 2))
    di = si - i0
    dj = sj - j0

    rel_i = (i0 - i_glob).astype(jnp.int32)   # in [-max_disp, max_disp]
    # Valid-row mask: rows padded beyond the domain / block (tile round-up)
    # clamp toward the domain and would otherwise widen the shift range to
    # ~tile_h on the last tile; their outputs are cropped anyway.
    row_valid = i_glob <= f32(h - 1)
    if bh is not None:
        row_valid &= (i_loc + f32(row0)) <= f32(bh - 1)

    ns_factor = None
    if no_slip:
        # advect.h:57-71, computed from the *unclamped* backtrace coords
        # (member-relative in tiled mode).
        def axis_factor(raw, n):
            under = raw < 0
            over = raw >= n - 1
            overshoot = jnp.where(under, -raw, raw - f32(n - 1))
            return jnp.where(
                under | over,
                jnp.where(overshoot < 0.5, 1.0 - 2.0 * overshoot, 0.0),
                1.0,
            )
        ns_factor = (axis_factor(si_raw - lo_i, mh)
                     * axis_factor(sj_raw - lo_j, mw))

    return rel_i, (1.0 - di, di), j0, dj, row_valid, ns_factor


def _advect_kernel_panel(goff_ref, vel_ref, field_hbm, *rest, dt, max_disp,
                         tile_h, tile_w, pr, h, w, bh, no_slip, pack,
                         ret_minmax, member=None, clip01=False, nopad=False,
                         rg=8):
    """One (row-tile, col-tile) program; all channels.  See module doc,
    variant "panel".

    Ref-access discipline (Mosaic): scratch refs are only ever read/written
    whole-channel (``ref[ch]``) or with 2D aligned slices; the shifted row
    windows are *value* slices, like the proven tilewide kernel — 3D-ref
    partial slices crash the Mosaic lowering on v5e.
    ``acc_vmem`` is (c*tile_h, tile_w): channel c's accumulator lives at
    rows [c*tile_h, (c+1)*tile_h) so every store is a 2D aligned slice.

    ``ret_minmax`` additionally tracks the min/max of the bilinear stencil
    corner values per output cell (MacCormack's monotonic clamp bounds,
    matching ``ops.advect.sample_linear(return_minmax=True)``).
    """
    if ret_minmax:
        (out_ref, mn_ref, mx_ref, src_vmem, acc_vmem, mn_vmem, mx_vmem,
         sem) = rest
    else:
        out_ref, src_vmem, acc_vmem, sem = rest
    n_ch = src_vmem.shape[0]
    ww = tile_w + 2 * _PANEL_LH        # window width (lane-dim)
    r = pl.program_id(0)
    cidx = pl.program_id(1)
    row0 = r * tile_h
    col0 = cidx * tile_w

    # Halo-window DMA, all channels at once.  fpad coords: global g ->
    # g + pr (rows) / g + LH (cols); the window starting at fpad (row0, col0)
    # covers global rows [row0-pr, row0+tile_h+pr) and cols
    # [col0-LH, col0+tile_w+LH).  LH=64 >= max_disp+1 is the left halo; the
    # 64 trailing lanes double as the right halo, so every output panel po
    # gathers from source panels {po, po+1} only.
    dma = pltpu.make_async_copy(
        field_hbm.at[:, pl.ds(row0, tile_h + 2 * pr), pl.ds(col0, ww)],
        src_vmem,
        sem,
    )
    dma.start()

    f32 = jnp.float32
    goff = (goff_ref[0, 0], goff_ref[0, 1])
    rel_i, (w_i0, w_i1), j0, dj, row_valid, ns_factor = _backtrace(
        vel_ref, row0, col0, dt=dt, max_disp=max_disp, tile_h=tile_h,
        tile_w=tile_w, h=h, w=w, no_slip=no_slip, goff=goff, bh=bh,
        member=member)

    # Local column of j0 inside the window: lj - (output lane) is in
    # [LH-max_disp-1, LH+max_disp] ⊂ [1, 127] for max_disp <= 62.  j0 is a
    # global coordinate; subtract the block offset to land in the window.
    lj = (j0 - goff[1].astype(f32) - f32(col0 - _PANEL_LH)).astype(jnp.int32)

    dma.wait()

    wins = []
    wins_next = []                     # one-lane-left-rolled copies (f32 path)
    for ch in range(n_ch):
        x = src_vmem[ch].astype(f32)
        if pack:
            # Pack adjacent bf16 columns (k, k+1) into one f32 lane: an f32
            # widened from bf16 carries the bf16 bits in its TOP half, so
            # lane k = (bits(x[k]) << 16) | bits(x[k+1]) as uint32.  One
            # gather then returns both bilinear column taps, exactly.
            # For f32 fields this path is opt-in (sample_bf16): source
            # values are rounded to bf16 first — approximate, ~2x faster.
            if src_vmem.dtype != jnp.bfloat16:
                x = x.astype(jnp.bfloat16).astype(f32)
            nxt = pltpu.roll(x, ww - 1, 1)         # x shifted left by one
            x = _bitcast_f32(_bitcast_u32(x) | (_bitcast_u32(nxt) >> 16))
        else:
            # Exact-f32 analogue of the pack trick: hoist the (k+1)-tap as a
            # whole rolled window so both bilinear column taps gather with
            # the SAME index vector (win_next[:, k] == win[:, k+1]; the
            # wrap lane ww-1 is never indexed by a valid output).  This
            # removes the second index set (mod1/div1/e1) from the panel
            # loop entirely.
            wins_next.append(pltpu.roll(x, ww - 1, 1))
        wins.append(x)

    acc_vmem[...] = jnp.zeros(acc_vmem.shape, f32)
    if ret_minmax:
        big = f32(3.4e38)
        mn_vmem[...] = jnp.full(mn_vmem.shape, big, f32)
        mx_vmem[...] = jnp.full(mx_vmem.shape, -big, f32)

    # Materialized full-width masked shifts: reducing a lane-slice of a
    # where()-of-slices expression crashes the Mosaic compiler on v5e
    # ("Check failed: limits[i] <= dim(i)"); reducing a slice of this
    # materialized array is fine.
    masked_rel = jnp.where(row_valid, rel_i, 0)

    n_out = tile_w // LANE
    for po in range(n_out):
        sl = slice(po * LANE, (po + 1) * LANE)
        rel_p = rel_i[:, sl]
        w0_p = w_i0[:, sl]
        w1_p = w_i1[:, sl]
        dj_p = dj[:, sl]
        lj_p = lj[:, sl]
        div_p = jnp.floor_divide(lj_p, LANE)
        mod_p = jnp.bitwise_and(lj_p, LANE - 1)
        # Every valid output's source column lands in source panel po or
        # po+1 (the LH=64 window guarantee, see the lj comment above), so
        # ONE one-hot select between the two panel gathers replaces the
        # round-2 mask-and-accumulate pipeline (2 wheres + 2 adds + zero
        # inits per panel per tap); invalid (cropped) outputs may select
        # garbage — finite by construction, never stored.
        e0 = div_p == po
        one_m_dj = 1.0 - dj_p

        # This panel's own shift range (occupancy skip): the smooth velocity
        # field makes it a small subset of the tile-wide range.
        smin = jnp.min(masked_rel[:, sl])
        smax = jnp.max(masked_rel[:, sl])

        for s in range(-max_disp, max_disp + 2):
            @pl.when(jnp.logical_and(smin <= s, s <= smax + 1))
            def _(s=s, po=po, sl=sl):
                # shift s serves rows with i0-row == s (weight 1-di) and
                # rows with i0+1-row == s (weight di); the two masks are
                # disjoint, so a nested select == the masked sum bit-exactly
                # (weights are never -0.0) with one fewer add
                contrib = jnp.where(rel_p == s, w0_p,
                                    jnp.where(rel_p == s - 1, w1_p, 0.0))
                if ret_minmax:
                    sel = jnp.logical_or(rel_p == s, rel_p == s - 1)
                for ch in range(n_ch):
                    chsl = slice(ch * tile_h, (ch + 1) * tile_h)
                    rows_s = wins[ch][pr + s:pr + s + tile_h, :]
                    pan0 = rows_s[:, po * LANE:(po + 1) * LANE]
                    pan1 = rows_s[:, (po + 1) * LANE:(po + 2) * LANE]
                    if pack:
                        gu = jnp.where(
                            e0,
                            _bitcast_u32(
                                jnp.take_along_axis(pan0, mod_p, axis=1)),
                            _bitcast_u32(
                                jnp.take_along_axis(pan1, mod_p, axis=1)))
                        rv0 = _bitcast_f32(gu & jnp.uint32(0xFFFF0000))
                        rv1 = _bitcast_f32(gu << 16)
                    else:
                        rows_n = wins_next[ch][pr + s:pr + s + tile_h, :]
                        rv0 = jnp.where(
                            e0,
                            jnp.take_along_axis(pan0, mod_p, axis=1),
                            jnp.take_along_axis(pan1, mod_p, axis=1))
                        rv1 = jnp.where(
                            e0,
                            jnp.take_along_axis(
                                rows_n[:, po * LANE:(po + 1) * LANE],
                                mod_p, axis=1),
                            jnp.take_along_axis(
                                rows_n[:, (po + 1) * LANE:(po + 2) * LANE],
                                mod_p, axis=1))
                    colv = rv0 * one_m_dj + rv1 * dj_p
                    acc_vmem[chsl, sl] += colv * contrib
                    if ret_minmax:
                        # MacCormack clamp bounds: extrema of the raw
                        # bilinear corner values at the backtraced point
                        lo = jnp.minimum(rv0, rv1)
                        hi = jnp.maximum(rv0, rv1)
                        cur_mn = mn_vmem[chsl, sl]
                        mn_vmem[chsl, sl] = jnp.where(
                            sel, jnp.minimum(cur_mn, lo), cur_mn)
                        cur_mx = mx_vmem[chsl, sl]
                        mx_vmem[chsl, sl] = jnp.where(
                            sel, jnp.maximum(cur_mx, hi), cur_mx)

    for ch in range(n_ch):
        a = acc_vmem[ch * tile_h:(ch + 1) * tile_h, :]
        if no_slip:
            a = a * ns_factor
        if clip01:
            # fused dye clamp (the step's jnp.clip(color, 0, 1) costs a
            # full extra HBM pass at 4096^2); clip-then-round == round-
            # then-clip here since 0.0/1.0 are exact in every out dtype
            a = jnp.clip(a, 0.0, 1.0)
        out_ref[ch, :, :] = a.astype(out_ref.dtype)
        if ret_minmax:
            mn_ref[ch, :, :] = mn_vmem[ch * tile_h:(ch + 1) * tile_h,
                                       :].astype(mn_ref.dtype)
            mx_ref[ch, :, :] = mx_vmem[ch * tile_h:(ch + 1) * tile_h,
                                       :].astype(mx_ref.dtype)


def _advect_kernel_panel_sloop(goff_ref, vel_ref, field_hbm, *rest, dt,
                               max_disp, tile_h, tile_w, pr, h, w, bh,
                               no_slip, pack, ret_minmax, member=None,
                               clip01=False, nopad=False, rg=8,
                               rgb565=False, bswap=True, self_adv=False,
                               has_overlay=False):
    """Panel kernel with the loop order swapped (variant "sloop"):
    shift outside, panels inside.

    ``self_adv``: field IS the velocity (the step's self-advect) —
    ``vel_ref`` is None and the backtrace reads the tile's velocity from
    the window CORE instead of a second BlockSpec input, dropping one full
    read of the velocity field per call.  The wait moves ahead of the
    backtrace; double-buffered prefetch keeps it cheap for every program
    but the first.

    The "panel" kernel evaluates a ``pl.when`` guard per (panel, slot) —
    ``(tile_w/128) * (2*max_disp+2)`` = 208 guard evaluations per tile at
    the production shape, and the guard machinery alone costs ~44 us per
    empty slot across a 4096^2 grid (~1 ms of a 4 ms velocity advect —
    measured round 4, tools/advect_cost_probe.py: md4 vs md12 at identical
    occupancy).  Here a TILE-wide guard prunes each shift slot first, so
    per-panel guards only run for shifts actually present somewhere in the
    tile: 26 + 8*active vs 8*26 evaluations.  Per-panel work and its
    ascending-shift accumulation order are unchanged -> bit-exact vs
    "panel".  A dynamic-slice ``fori_loop`` walk (only the occupied range,
    no guards at all) was tried first: Mosaic requires sublane starts
    provably divisible by 8, and the shift offset isn't.
    """
    ov_ref = None
    if has_overlay:
        ov_ref, rest = rest[0], rest[1:]
    if ret_minmax:
        (out_ref, mn_ref, mx_ref, src_vmem, acc_vmem, mn_vmem, mx_vmem,
         sem) = rest
    elif rgb565:
        out_ref, frame_ref, src_vmem, acc_vmem, sem = rest
    else:
        out_ref, src_vmem, acc_vmem, sem = rest
    n_ch = src_vmem.shape[1]
    ww = tile_w + 2 * _PANEL_LH
    r = pl.program_id(0)
    cidx = pl.program_id(1)
    row0 = r * tile_h
    col0 = cidx * tile_w

    # Double-buffered window DMA across the sequential grid walk (same
    # pattern as ops/pallas/project.py): tile i+1's window streams in
    # during tile i's gather loop, instead of hiding only behind the
    # backtrace math.  nopad mode loads the window straight from the
    # UNPADDED field as a 3x3 conditional patchwork (ops/pallas/window.py)
    # — the caller then skips the fpad HBM copy entirely.  The patchwork
    # window carries a 128-lane halo (the smallest DMA-legal lane unit);
    # one roll per channel below restores the 64-lane panel-band origin.
    nc_ = pl.num_programs(1)
    npr_ = pl.num_programs(0)
    idx = r * nc_ + cidx
    slot = jax.lax.rem(idx, 2)

    if nopad:
        def _win_ops(i, s):
            return window_ops(field_hbm, src_vmem.at[s], sem.at[s], i,
                              nc=nc_, npr=npr_, th=tile_h, tw=tile_w,
                              pr=pr, lpad=LANE_PAD, rg=rg)

        def start_win(i, s):
            issue(_win_ops(i, s), "start")

        def wait_win(i, s):
            issue(_win_ops(i, s), "wait")
    else:
        def win_dma(i, s):
            r0 = (i // nc_) * tile_h
            c0 = jax.lax.rem(i, nc_) * tile_w
            return pltpu.make_async_copy(
                field_hbm.at[:, pl.ds(r0, tile_h + 2 * pr), pl.ds(c0, ww)],
                src_vmem.at[s], sem.at[s])

        def start_win(i, s):
            win_dma(i, s).start()

        def wait_win(i, s):
            win_dma(i, s).wait()

    @pl.when(idx == 0)
    def _():
        start_win(idx, slot)

    @pl.when(idx + 1 < npr_ * nc_)
    def _():
        start_win(idx + 1, 1 - slot)

    f32 = jnp.float32
    goff = (goff_ref[0, 0], goff_ref[0, 1])
    if self_adv:
        # the tile's velocity IS the window core: wait first (the
        # double-buffered prefetch makes this near-free except program 0),
        # then backtrace from the in-window values — no separate vel read.
        wait_win(idx, slot)
        if nopad:
            zero_skipped_strips(src_vmem.at[slot], r, cidx, npr_, nc_,
                                n_ch=n_ch, th=tile_h, tw=tile_w, pr=pr,
                                lpad=LANE_PAD, dtype=src_vmem.dtype)
        off = LANE_PAD if nopad else _PANEL_LH
        vel_ref = [src_vmem[slot, ch][pr:pr + tile_h, off:off + tile_w]
                   for ch in range(2)]
    rel_i, (w_i0, w_i1), j0, dj, row_valid, ns_factor = _backtrace(
        vel_ref, row0, col0, dt=dt, max_disp=max_disp, tile_h=tile_h,
        tile_w=tile_w, h=h, w=w, no_slip=no_slip, goff=goff, bh=bh,
        member=member)
    lj = (j0 - goff[1].astype(f32) - f32(col0 - _PANEL_LH)).astype(jnp.int32)

    if not self_adv:
        wait_win(idx, slot)
        if nopad:
            # strips the patchwork skipped at domain edges hold stale/uninit
            # VMEM; the multiply-accumulate below needs them FINITE (0*NaN
            # would poison valid outputs), so zero them.  Edge programs only.
            zero_skipped_strips(src_vmem.at[slot], r, cidx, npr_, nc_,
                                n_ch=n_ch, th=tile_h, tw=tile_w, pr=pr,
                                lpad=LANE_PAD, dtype=src_vmem.dtype)

    wins = []
    wins_next = []
    wide = tile_w + 2 * LANE_PAD
    for ch in range(n_ch):
        x = src_vmem[slot, ch].astype(f32)
        if nopad:
            # wide-window lane origin is LANE_PAD; the panel band math
            # expects origin _PANEL_LH — roll left by the difference and
            # crop (bit-exact data movement, ~VPU-free next to the
            # gathers; wrap lanes land beyond the crop).  Rolled AFTER the
            # f32 upcast: Mosaic's lane rotate is 32-bit-only on v5e.
            x = pltpu.roll(x, wide - (LANE_PAD - _PANEL_LH), 1)[:, :ww]
        if pack:
            if src_vmem.dtype != jnp.bfloat16:
                x = x.astype(jnp.bfloat16).astype(f32)
            nxt = pltpu.roll(x, ww - 1, 1)
            x = _bitcast_f32(_bitcast_u32(x) | (_bitcast_u32(nxt) >> 16))
        else:
            wins_next.append(pltpu.roll(x, ww - 1, 1))
        wins.append(x)

    acc_vmem[...] = jnp.zeros(acc_vmem.shape, f32)
    if ret_minmax:
        big = f32(3.4e38)
        mn_vmem[...] = jnp.full(mn_vmem.shape, big, f32)
        mx_vmem[...] = jnp.full(mx_vmem.shape, -big, f32)

    masked_rel = jnp.where(row_valid, rel_i, 0)
    n_out = tile_w // LANE

    # per-panel invariants + occupancy, hoisted out of the shift loop
    P = []
    for po in range(n_out):
        sl = slice(po * LANE, (po + 1) * LANE)
        lj_p = lj[:, sl]
        P.append(dict(
            sl=sl,
            rel_p=rel_i[:, sl], w0_p=w_i0[:, sl], w1_p=w_i1[:, sl],
            dj_p=dj[:, sl], one_m_dj=1.0 - dj[:, sl],
            mod_p=jnp.bitwise_and(lj_p, LANE - 1),
            e0=jnp.floor_divide(lj_p, LANE) == po,
            smin=jnp.min(masked_rel[:, sl]),
            smax=jnp.max(masked_rel[:, sl]),
        ))
    tmin = jnp.min(masked_rel)
    tmax = jnp.max(masked_rel)

    for s in range(-max_disp, max_disp + 2):
        @pl.when(jnp.logical_and(tmin <= s, s <= tmax + 1))
        def _(s=s):
            rows_all = [wins[ch][pr + s:pr + s + tile_h, :]
                        for ch in range(n_ch)]
            rows_n_all = (None if pack else
                          [wins_next[ch][pr + s:pr + s + tile_h, :]
                           for ch in range(n_ch)])
            for po in range(n_out):
                p = P[po]

                @pl.when(jnp.logical_and(p["smin"] <= s,
                                         s <= p["smax"] + 1))
                def _(s=s, po=po, p=p, rows_all=rows_all,
                      rows_n_all=rows_n_all):
                    sl = p["sl"]
                    rel_p = p["rel_p"]
                    mod_p = p["mod_p"]
                    e0 = p["e0"]
                    contrib = jnp.where(rel_p == s, p["w0_p"],
                                        jnp.where(rel_p == s - 1,
                                                  p["w1_p"], 0.0))
                    if ret_minmax:
                        sel = jnp.logical_or(rel_p == s, rel_p == s - 1)
                    for ch in range(n_ch):
                        chsl = slice(ch * tile_h, (ch + 1) * tile_h)
                        rows_s = rows_all[ch]
                        pan0 = rows_s[:, po * LANE:(po + 1) * LANE]
                        pan1 = rows_s[:, (po + 1) * LANE:(po + 2) * LANE]
                        if pack:
                            gu = jnp.where(
                                e0,
                                _bitcast_u32(
                                    jnp.take_along_axis(pan0, mod_p,
                                                        axis=1)),
                                _bitcast_u32(
                                    jnp.take_along_axis(pan1, mod_p,
                                                        axis=1)))
                            rv0 = _bitcast_f32(gu & jnp.uint32(0xFFFF0000))
                            rv1 = _bitcast_f32(gu << 16)
                        else:
                            rows_n = rows_n_all[ch]
                            rv0 = jnp.where(
                                e0,
                                jnp.take_along_axis(pan0, mod_p, axis=1),
                                jnp.take_along_axis(pan1, mod_p, axis=1))
                            rv1 = jnp.where(
                                e0,
                                jnp.take_along_axis(
                                    rows_n[:, po * LANE:(po + 1) * LANE],
                                    mod_p, axis=1),
                                jnp.take_along_axis(
                                    rows_n[:, (po + 1) * LANE:
                                           (po + 2) * LANE],
                                    mod_p, axis=1))
                        colv = rv0 * p["one_m_dj"] + rv1 * p["dj_p"]
                        acc_vmem[chsl, sl] += colv * contrib
                        if ret_minmax:
                            lo = jnp.minimum(rv0, rv1)
                            hi = jnp.maximum(rv0, rv1)
                            cur_mn = mn_vmem[chsl, sl]
                            mn_vmem[chsl, sl] = jnp.where(
                                sel, jnp.minimum(cur_mn, lo), cur_mn)
                            cur_mx = mx_vmem[chsl, sl]
                            mx_vmem[chsl, sl] = jnp.where(
                                sel, jnp.maximum(cur_mx, hi), cur_mx)

    stored = []
    for ch in range(n_ch):
        a = acc_vmem[ch * tile_h:(ch + 1) * tile_h, :]
        if no_slip:
            a = a * ns_factor
        if clip01:
            a = jnp.clip(a, 0.0, 1.0)
        if has_overlay:
            # impulse drain riding the store (.ino:264-269 as a post-advect
            # overwrite): channel n_ch of the overlay block is the write
            # flag, channels [0, n_ch) the values.  Replaces the standalone
            # XLA scatter between this kernel and the projection, which XLA
            # wraps in two full-grid relayout copies (~2.6 ms at 4096^2).
            a = jnp.where(ov_ref[n_ch] > 0.0, ov_ref[ch].astype(f32), a)
        st_c = a.astype(out_ref.dtype)
        out_ref[ch, :, :] = st_c
        if rgb565:
            stored.append(st_c.astype(f32))
        if ret_minmax:
            mn_ref[ch, :, :] = mn_vmem[ch * tile_h:(ch + 1) * tile_h,
                                       :].astype(mn_ref.dtype)
            mx_ref[ch, :, :] = mx_vmem[ch * tile_h:(ch + 1) * tile_h,
                                       :].astype(mx_ref.dtype)
    if rgb565:
        # the s=1 RGB565 pack rides the store: quantize the STORED (dtype-
        # rounded) values so the frame is bit-identical to
        # render_rgb565(out, s=1) on the written color.  clip01 guarantees
        # [0, 1], so min() alone bounds the code (render _quant unit_range).
        def q(v, bits):
            return jnp.minimum((v * f32(1 << bits)).astype(jnp.int32),
                               (1 << bits) - 1)

        word = (q(stored[0], 5) << 11) | (q(stored[1], 6) << 5) \
            | q(stored[2], 5)
        if bswap:
            word = ((word << 8) | (word >> 8)) & 0xFFFF
        frame_ref[:, :] = word.astype(jnp.uint16)


def _advect_kernel(vel_ref, field_hbm, out_ref, src_vmem, *scratch,
                   dt, max_disp, tile_h, tile_w, pr, pc, h, w, no_slip,
                   static_unroll):
    """Round-1 kernel (variants "tilewide"/"dynamic"): tile-wide shift
    range, 3-panel gather band.  pr/pc: aligned halo widths, > max_disp."""
    if static_unroll:
        acc_vmem, sem = scratch
    else:
        (sem,) = scratch
    n_ch = src_vmem.shape[0]
    r = pl.program_id(0)
    cidx = pl.program_id(1)
    row0 = r * tile_h
    col0 = cidx * tile_w

    dma = pltpu.make_async_copy(
        field_hbm.at[:,
                     pl.ds(row0, tile_h + 2 * pr),
                     pl.ds(col0, tile_w + 2 * pc)],
        src_vmem,
        sem,
    )
    dma.start()

    f32 = jnp.float32
    rel_i, (w_i0, w_i1), j0, dj, row_valid, ns_factor = _backtrace(
        vel_ref, row0, col0, dt=dt, max_disp=max_disp, tile_h=tile_h,
        tile_w=tile_w, h=h, w=w, no_slip=no_slip)
    smin = jnp.min(jnp.where(row_valid, rel_i, 0))
    smax = jnp.max(jnp.where(row_valid, rel_i, 0))

    dma.wait()

    lj = (j0 - f32(col0 - pc)).astype(jnp.int32)  # local col of j0 in src
    lj1 = lj + 1
    one_m_dj = 1.0 - dj
    q_base = lambda po: po  # noqa: E731  (pc == 128 panels exactly)
    band = pc // 128 + 2

    def s_contrib(s, rows_s):
        g0 = lane_gather(rows_s, lj, q_base=q_base, band=band)
        g1 = lane_gather(rows_s, lj1, q_base=q_base, band=band)
        colv = g0 * one_m_dj + g1 * dj
        contrib = (jnp.where(rel_i == s, w_i0, 0.0)
                   + jnp.where(rel_i == s - 1, w_i1, 0.0))
        return colv * contrib

    for ch in range(n_ch):
        src = src_vmem[ch].astype(f32)
        if static_unroll:
            # Fully unrolled: every possible shift is a static slice (no
            # dynamic rotate) guarded by a runtime branch that skips shifts
            # not present in this tile — zero loop-carry overhead (Mosaic
            # while-loops round-trip their carries to VMEM, and the dynamic
            # variant miscompiles on real v5e silicon at some shapes).
            acc_vmem[...] = jnp.zeros((tile_h, tile_w), f32)
            for s in range(-max_disp, max_disp + 2):
                @pl.when(jnp.logical_and(smin <= s, s <= smax + 1))
                def _(s=s, src=src):
                    rows_s = src[pr + s:pr + s + tile_h, :]
                    acc_vmem[...] += s_contrib(s, rows_s)
            acc = acc_vmem[...]
        else:
            def s_body(s, acc, src=src):
                # rows shifted by s: rows_s[i, :] = src[pr + i + s, :]
                rows_s = pltpu.roll(src, -s, 0)[pr:pr + tile_h, :]
                return acc + s_contrib(s, rows_s)

            acc = jnp.zeros((tile_h, tile_w), f32)
            acc = jax.lax.fori_loop(smin, smax + 2, s_body, acc)

        if no_slip:
            acc = acc * ns_factor
        out_ref[ch, :, :] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dt", "no_slip", "max_disp", "tile_h", "tile_w",
                     "static_unroll", "variant", "global_shape", "halo",
                     "sample_bf16", "return_minmax", "member", "clip01",
                     "nopad", "rgb565", "bswap", "self_advect"))
def advect_pallas(field: jax.Array, vel: jax.Array, dt: float, no_slip: bool,
                  max_disp: int = 12, tile_h: int = 64, tile_w: int = 1024,
                  static_unroll: bool | None = None, variant: str = "sloop",
                  global_offset: jax.Array | None = None,
                  global_shape: Tuple[int, int] | None = None,
                  halo: int = 0, sample_bf16: bool = False,
                  return_minmax: bool = False, member=None,
                  clip01: bool = False, nopad: bool | None = None,
                  rgb565: bool = False, bswap: bool = True,
                  self_advect: bool = False,
                  overlay: jax.Array | None = None):
    """Drop-in replacement for ``ops.advect.advect`` on large 2D grids.

    field: ``[H, W]`` or ``[C, H, W]``; vel: ``[2, H, W]``.  Displacements
    are clamped to ``max_disp`` cells (CFL clamp).  ``tile_h=64`` measured
    fastest on v5e at 4096^2 *post one-hot-select restructure* (interleaved
    best-of-3 on an evolved field: vel 3.5/dye 1.6 ms vs 4.2/3.4 at the
    round-2 winner th=32, 6+ ms at th>=96 — the restructure shrank the
    per-shift overhead that narrow tiles were bounding).

    variant: "panel" (production; per-panel occupancy skips, 2-panel gather
    band, packed-pair bf16 gathers), "tilewide" (round-1 kernel), "dynamic"
    (fori_loop + dynamic rotate — miscompiles on real v5e at some shapes;
    kept as a reproducer).  ``static_unroll`` is a legacy alias:
    True -> "tilewide", False -> "dynamic".

    Block mode (the ``shard_map`` path; "panel" only): when
    ``global_offset`` — a traced ``(2,)`` int32 array — is given, ``field``
    is one shard's local block carrying ``halo`` exchanged ghost cells per
    side (``parallel.halo.exchange_halo``), ``vel`` is the unpadded local
    block, and ``global_shape`` is the full-domain extent the boundary
    clamps / no-slip tests evaluate against.  Requires
    ``halo >= max_disp + 1`` of valid neighbor data.
    """
    if static_unroll is not None:
        variant = "tilewide" if static_unroll else "dynamic"
    if max_disp + 1 > 128:
        raise ValueError(
            f"max_disp={max_disp} exceeds the one-panel lane halo the "
            f"gather band assumes (max_disp <= 127)")
    panel_like = ("panel", "sloop")
    if variant in panel_like and max_disp > _PANEL_LH - 2:
        variant = "tilewide"   # 2-panel band needs max_disp <= 62
    block_mode = global_offset is not None
    if block_mode and variant not in panel_like:
        raise ValueError("block mode (global_offset) requires the panel/"
                         "fori variants (max_disp <= 62)")
    if return_minmax and variant not in panel_like:
        raise ValueError("return_minmax requires the panel/fori variants")
    if member is not None and variant not in panel_like:
        raise ValueError("tiled-domain mode requires the panel/fori variants")
    if clip01 and variant not in panel_like:
        raise ValueError("clip01 requires the panel/fori variants")
    if rgb565 and (variant != "sloop" or not clip01 or return_minmax
                   or field.ndim != 3 or field.shape[0] != 3):
        raise ValueError("rgb565 needs the sloop variant with clip01 on a "
                         "3-channel field (and no return_minmax)")
    if self_advect and (variant != "sloop" or global_offset is not None
                        or field.ndim != 3 or field.shape[0] != 2):
        raise ValueError("self_advect needs the sloop variant on a "
                         "2-channel field (field IS vel), single device")
    if overlay is not None:
        if (variant != "sloop" or return_minmax or rgb565
                or global_offset is not None):
            raise ValueError("overlay needs the plain sloop variant "
                             "(no return_minmax/rgb565/block mode)")
        c_f = 1 if field.ndim == 2 else field.shape[0]
        if overlay.shape != (c_f + 1,) + field.shape[-2:]:
            raise ValueError(
                f"overlay must be [{c_f + 1}, H, W] (values + write flag), "
                f"got {overlay.shape}")
    if block_mode and halo < max_disp + 1:
        raise ValueError(f"block mode needs halo >= max_disp+1 ghost cells "
                         f"({halo} < {max_disp + 1})")
    squeeze = field.ndim == 2
    if squeeze:
        field = field[None]
    c = field.shape[0]
    if block_mode:
        bh, bw = field.shape[1] - 2 * halo, field.shape[2] - 2 * halo
        h, w = global_shape
    else:
        bh, bw = field.shape[1], field.shape[2]
        h, w = bh, bw
    pr = pl.cdiv(max_disp + 1, 8) * 8       # aligned sublane halo
    th = min(tile_h, pl.cdiv(bh, 8) * 8)
    tw = min(tile_w, pl.cdiv(bw, 128) * 128)
    hp = pl.cdiv(bh, th) * th
    wp = pl.cdiv(bw, tw) * tw
    goff = (jnp.zeros((1, 2), jnp.int32) if global_offset is None
            else global_offset.astype(jnp.int32).reshape(1, 2))

    if variant in panel_like:
        lh = _PANEL_LH
        # bf16 fields pack exactly; f32 fields pack (lossily, rounding the
        # source to bf16) only when sample_bf16 is set — a production-perf
        # knob that halves the gather count and window DMA.
        pack = field.dtype == jnp.bfloat16 or sample_bf16
        if halo > min(pr, lh):
            raise ValueError(f"halo={halo} exceeds the aligned kernel halo "
                             f"(pr={pr}, lane halo {lh})")
        # nopad: load windows straight from the unpadded field (3x3
        # conditional patchwork, ops/pallas/window.py) and skip the fpad
        # HBM copy — legal whenever no block-mode halo ring is embedded,
        # the tiling divides exactly, and the row halo/tile sizes satisfy
        # the dtype's sublane-tile divisibility (8 f32 / 16 bf16).
        rg = 16 if field.dtype.itemsize == 2 else 8
        nopad_ok = (variant == "sloop" and not block_mode and halo == 0
                    and hp == bh and wp == bw
                    and pr % rg == 0 and th % rg == 0 and th >= pr)
        if nopad is None:
            # Default ON when eligible: the patchwork pieces are issued
            # UNCONDITIONALLY with clamped sources (ops/pallas/window.py)
            # — the original pl.when-guarded variant was a perf wash (the
            # guards defeat Mosaic's DMA pipelining), but the clamped form
            # pipelines like plain copies and skips the fpad HBM copy:
            # vel f32 3.11 -> 2.34 ms, dye bf16 1.97 -> 1.90 ms at 4096^2
            # on an evolved production field, bit-exact
            # (tools/nopad_evolved_probe.py, 2026-08-19).
            nopad = nopad_ok
        elif nopad and not nopad_ok:
            raise ValueError("nopad=True requested but the config is not "
                             "nopad-eligible (needs sloop, no block halo, "
                             "exact tiling, and rg-aligned pr/th)")
        ww = tw + 2 * (LANE_PAD if nopad else lh)
        if nopad:
            fsrc = field
            vpad = vel
        else:
            # Zero-pad: halo on all sides plus tiling round-up.  Padded
            # values are never selected for valid outputs (masks guarantee
            # in-domain indices); they only make the window DMAs
            # unconditionally in-bounds.  In block mode the innermost
            # ``halo`` ring is the exchanged neighbor data and stays where
            # the coordinate maps expect it.  zeros+dynamic_update_slice
            # instead of jnp.pad: measurably faster for bf16 fields on
            # v5e (0.53 -> 0.35 ms at 4096^2x3ch), equal for f32 — the
            # same trick as render/pallas_upscale._padded.
            fsrc = jax.lax.dynamic_update_slice(
                jnp.zeros((c, hp + 2 * pr, wp + 2 * lh), field.dtype),
                field, (0, pr - halo, lh - halo))
            vpad = jnp.pad(vel, ((0, 0), (0, hp - bh), (0, wp - bw)))

        kern_fn = (_advect_kernel_panel if variant == "panel"
                   else _advect_kernel_panel_sloop)
        kwextra = (dict(rgb565=rgb565, bswap=bswap, self_adv=self_advect,
                        has_overlay=overlay is not None)
                   if variant == "sloop" else {})
        kernel = functools.partial(
            kern_fn, dt=dt, max_disp=max_disp, tile_h=th,
            tile_w=tw, pr=pr, h=h, w=w, bh=bh, no_slip=no_slip, pack=pack,
            ret_minmax=return_minmax, member=member, clip01=clip01,
            nopad=nopad, rg=rg, **kwextra)
        if self_advect:
            base_kernel = kernel

            def kernel(goff_ref, field_hbm, *rest):
                return base_kernel(goff_ref, None, field_hbm, *rest)

        grid_block = pl.BlockSpec((c, th, tw), lambda r, cl: (0, r, cl),
                                  memory_space=pltpu.VMEM)
        sds = jax.ShapeDtypeStruct((c, hp, wp), field.dtype)
        if return_minmax:
            out_specs, out_shape = (grid_block,) * 3, (sds,) * 3
        elif rgb565:
            out_specs = (grid_block,
                         pl.BlockSpec((th, tw), lambda r, cl: (r, cl),
                                      memory_space=pltpu.VMEM))
            out_shape = (sds, jax.ShapeDtypeStruct((hp, wp), jnp.uint16))
        else:
            out_specs, out_shape = grid_block, sds
        vel_spec = [] if self_advect else [
            pl.BlockSpec((2, th, tw), lambda r, cl: (0, r, cl),
                         memory_space=pltpu.VMEM)]
        ov_args = []
        ov_spec = []
        if overlay is not None:
            ovp = overlay.astype(jnp.float32)
            if (hp, wp) != (bh, bw):
                ovp = jnp.pad(ovp, ((0, 0), (0, hp - bh), (0, wp - bw)))
            ov_args = [ovp]
            ov_spec = [pl.BlockSpec((c + 1, th, tw), lambda r, cl: (0, r, cl),
                                    memory_space=pltpu.VMEM)]
        out = pl.pallas_call(
            kernel,
            grid=(hp // th, wp // tw),
            in_specs=[
                pl.BlockSpec((1, 2), lambda r, cl: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + vel_spec + [
                pl.BlockSpec(memory_space=pl.ANY),  # padded field, own DMA
            ] + ov_spec,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=(
                [(pltpu.VMEM((2, c, th + 2 * pr, ww), fsrc.dtype)
                  if variant == "sloop" else
                  pltpu.VMEM((c, th + 2 * pr, ww), fsrc.dtype)),
                 pltpu.VMEM((c * th, tw), jnp.float32)]
                + ([pltpu.VMEM((c * th, tw), jnp.float32)] * 2
                   if return_minmax else [])
                + [pltpu.SemaphoreType.DMA((2, 3, 3)) if nopad
                   else pltpu.SemaphoreType.DMA((2,)) if variant == "sloop"
                   else pltpu.SemaphoreType.DMA]
            ),
        )(*(((goff, fsrc) if self_advect else (goff, vpad, fsrc))
            + tuple(ov_args)))
        if return_minmax:
            out, mn, mx = out
            crop = (slice(None), slice(0, bh), slice(0, bw))
            if squeeze:
                return out[crop][0], mn[crop][0], mx[crop][0]
            return out[crop], mn[crop], mx[crop]
    else:
        pc = pl.cdiv(max_disp + 1, 128) * 128   # aligned lane halo
        fpad = jnp.pad(field, ((0, 0), (pr, pr + hp - h), (pc, pc + wp - w)))
        vpad = jnp.pad(vel, ((0, 0), (0, hp - h), (0, wp - w)))

        kernel = functools.partial(
            _advect_kernel, dt=dt, max_disp=max_disp, tile_h=th, tile_w=tw,
            pr=pr, pc=pc, h=h, w=w, no_slip=no_slip,
            static_unroll=(variant == "tilewide"))

        out = pl.pallas_call(
            kernel,
            grid=(hp // th, wp // tw),
            in_specs=[
                pl.BlockSpec((2, th, tw), lambda r, cl: (0, r, cl),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # padded field, own DMA
            ],
            out_specs=pl.BlockSpec((c, th, tw), lambda r, cl: (0, r, cl),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, hp, wp), field.dtype),
            scratch_shapes=(
                [pltpu.VMEM((c, th + 2 * pr, tw + 2 * pc), fpad.dtype)]
                + ([pltpu.VMEM((th, tw), jnp.float32)]
                   if variant == "tilewide" else [])
                + [pltpu.SemaphoreType.DMA]
            ),
        )(vpad, fpad)

    if rgb565:
        out, frame = out
        # render s=1 crops the lerp-endpoint row/col (upscale_bilinear)
        return out[:, :bh, :bw], frame[:bh - 1, :bw - 1]
    out = out[:, :bh, :bw]
    return out[0] if squeeze else out


def advect_maccormack_pallas(field: jax.Array, vel: jax.Array, dt: float,
                             no_slip: bool, max_disp: int = 12, **kw):
    """MacCormack advection (ops.advect.advect_maccormack) with kernel-backed
    gathers: forward predictor with in-kernel stencil extrema, backward
    corrector (= forward advection through ``-vel``), monotonic clamp.
    Displacements are CFL-clamped to ``max_disp`` like the semilag kernel."""
    if "global_offset" in kw or "halo" in kw:
        # phi_hat comes back without ghost cells, so feeding it to the
        # backward pass as a haloed block would silently misread — the
        # sharded MacCormack path lives in parallel/sharded.py instead
        raise ValueError("advect_maccormack_pallas is single-device only; "
                         "block-mode kwargs are not supported")
    phi_hat, cmin, cmax = advect_pallas(field, vel, dt, no_slip,
                                        max_disp=max_disp,
                                        return_minmax=True, **kw)
    phi_back = advect_pallas(phi_hat, -vel, dt, no_slip, max_disp=max_disp,
                             **kw)
    corrected = phi_hat + 0.5 * (field - phi_back)
    # bounds include the (possibly no-slip-discounted) predictor — see
    # ops.advect.advect_maccormack
    cmin = jnp.minimum(cmin, phi_hat)
    cmax = jnp.maximum(cmax, phi_hat)
    return jnp.clip(corrected, cmin, cmax)
