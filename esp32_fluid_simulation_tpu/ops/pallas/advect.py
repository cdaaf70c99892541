"""Pallas TPU kernel for semi-Lagrangian advection.

Why: the backtrace sample is a 2D gather, and XLA's TPU gather runs at
~120M points/s — it was ~70% of the whole step at 4096^2.  TPUs have no fast
arbitrary gather, but the backtrace displacement is physically bounded by the
CFL number; this kernel exploits that:

* the grid is tiled; each program DMAs its (tile + halo) window of the field
  from HBM into VMEM.  The halo covers ``max_disp + 1`` cells and is rounded
  up to hardware tile multiples (8 sublanes / 128 lanes) so every VMEM shape
  is aligned;
* the column component of the bilinear gather is ONE hardware op —
  ``tpu.dynamic_gather`` (``jnp.take_along_axis`` along lanes), the only
  arbitrary per-element gather the VPU has.  A full 2D per-element gather
  cannot be composed from two 1D gathers (the inner index field would be
  re-evaluated at gathered positions), so the row component is resolved by a
  short *dynamic* loop over the integer row shifts actually present in the
  tile (``fori_loop`` over the tile's min/max backtrace offset — typically a
  handful, bounded by ``2*max_disp+2``); each iteration rotates the haloed
  tile by one row shift (``tpu.dynamic_rotate`` — Mosaic has no unaligned
  dynamic vector loads, but it does have dynamic rotates), lane-gathers the
  two bilinear columns, and accumulates the masked row weight;
* boundary semantics match the reference sampler (``advect.h:24-72``):
  clamped-coordinate multilinear interpolation == edge lerp, and the no-slip
  overshoot discount is computed from the *unclamped* coords and applied at
  the end.

Displacements beyond ``max_disp`` cells are clamped (a CFL clamp — standard
practice; the pure-jnp path in ``ops.advect`` remains the unclamped
reference implementation and the small-grid default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_utils import lane_gather


def _advect_kernel(vel_ref, field_hbm, out_ref, src_vmem, *scratch,
                   dt, max_disp, tile_h, tile_w, pr, pc, h, w, no_slip,
                   static_unroll):
    """One (channel, row-tile, col-tile) program.

    pr/pc: aligned halo widths (rows/cols), both > max_disp.
    """
    if static_unroll:
        acc_vmem, sem = scratch
    else:
        (sem,) = scratch
    n_ch = src_vmem.shape[0]
    r = pl.program_id(0)
    cidx = pl.program_id(1)
    row0 = r * tile_h
    col0 = cidx * tile_w

    # Halo-window DMA, all channels at once (one program per spatial tile:
    # per-kernel launch overhead dominated the first version's runtime).
    # fpad coords: global g -> g + pr (rows) / + pc (cols), so the window
    # starting at (row0, col0) covers global rows [row0-pr, row0+tile_h+pr).
    dma = pltpu.make_async_copy(
        field_hbm.at[:,
                     pl.ds(row0, tile_h + 2 * pr),
                     pl.ds(col0, tile_w + 2 * pc)],
        src_vmem,
        sem,
    )
    dma.start()

    # Backtrace coordinates (advect.h:81): source = idx - vel*dt.
    f32 = jnp.float32
    i_loc = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 0).astype(f32)
    j_loc = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 1).astype(f32)
    i_glob = i_loc + f32(row0)
    j_glob = j_loc + f32(col0)
    v0 = vel_ref[0].astype(f32)
    v1 = vel_ref[1].astype(f32)
    si_raw = i_glob - v0 * f32(dt)
    sj_raw = j_glob - v1 * f32(dt)

    # CFL clamp to the halo radius, then the reference's domain clamp
    # (edge-collapse sampling, advect.h:44-55).
    si = jnp.clip(si_raw, i_glob - max_disp, i_glob + max_disp)
    sj = jnp.clip(sj_raw, j_glob - max_disp, j_glob + max_disp)
    si = jnp.clip(si, 0.0, f32(h - 1))
    sj = jnp.clip(sj, 0.0, f32(w - 1))
    i0 = jnp.clip(jnp.floor(si), 0.0, f32(h - 2))
    j0 = jnp.clip(jnp.floor(sj), 0.0, f32(w - 2))
    di = si - i0
    dj = sj - j0

    rel_i = (i0 - i_glob).astype(jnp.int32)   # in [-max_disp, max_disp]
    # Loop bounds from VALID rows only: rows padded beyond h (tile round-up)
    # clamp toward the domain and would otherwise widen the shift range to
    # ~tile_h on the last tile; their outputs are cropped anyway.
    row_valid = i_glob <= f32(h - 1)
    smin = jnp.min(jnp.where(row_valid, rel_i, 0))
    smax = jnp.max(jnp.where(row_valid, rel_i, 0))

    dma.wait()

    # Column gather: hardware lane gathers (tpu.dynamic_gather), panel-
    # decomposed because the gather source may only span one 128-lane vreg
    # (gather_utils).  The backtrace is CFL-bounded, so each 128-wide output
    # panel po only ever indexes source panels {po, po+1, po+2} (the halo is
    # one 128-lane panel).  The remaining row displacement is a short
    # dynamic loop over the integer shifts actually present in the tile
    # (typically a handful; bounded by 2*max_disp+2).
    lj = (j0 - f32(col0 - pc)).astype(jnp.int32)  # local col of j0 in src
    lj1 = lj + 1
    one_m_dj = 1.0 - dj
    w_i0 = 1.0 - di
    w_i1 = di
    q_base = lambda po: po  # noqa: E731  (pc == 128 panels exactly)
    band = pc // 128 + 2

    def s_contrib(s, rows_s):
        g0 = lane_gather(rows_s, lj, q_base=q_base, band=band)
        g1 = lane_gather(rows_s, lj1, q_base=q_base, band=band)
        colv = g0 * one_m_dj + g1 * dj
        contrib = (jnp.where(rel_i == s, w_i0, 0.0)
                   + jnp.where(rel_i == s - 1, w_i1, 0.0))
        return colv * contrib

    if no_slip:
        # advect.h:57-71, computed from the *unclamped* backtrace coords.
        def axis_factor(raw, n):
            under = raw < 0
            over = raw >= n - 1
            overshoot = jnp.where(under, -raw, raw - f32(n - 1))
            return jnp.where(
                under | over,
                jnp.where(overshoot < 0.5, 1.0 - 2.0 * overshoot, 0.0),
                1.0,
            )
        ns_factor = axis_factor(si_raw, h) * axis_factor(sj_raw, w)

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
                     "static_unroll"))
def advect_pallas(field: jax.Array, vel: jax.Array, dt: float, no_slip: bool,
                  max_disp: int = 12, tile_h: int = 128, tile_w: int = 1024,
                  static_unroll: bool = True):
    """Drop-in replacement for ``ops.advect.advect`` on large 2D grids.

    field: ``[H, W]`` or ``[C, H, W]``; vel: ``[2, H, W]``.  Displacements
    are clamped to ``max_disp`` cells (CFL clamp).

    ``static_unroll=True`` is the default and the production path: measured
    bit-exact AND ~5x faster than the dynamic fori_loop variant on real v5e
    hardware (0.11 ms vs 0.60 ms for a 3-channel 1024^2 advect).  The
    dynamic variant MISCOMPILES on real silicon (tpu.dynamic_rotate inside a
    while-loop produced wrong values on half the grid; interpret mode and
    the AOT verifier do not catch it) — kept only as a reproducer.
    """
    if max_disp + 1 > 128:
        raise ValueError(
            f"max_disp={max_disp} exceeds the one-panel lane halo the "
            f"gather band assumes (max_disp <= 127)")
    squeeze = field.ndim == 2
    if squeeze:
        field = field[None]
    c, h, w = field.shape
    pr = pl.cdiv(max_disp + 1, 8) * 8       # aligned sublane halo
    pc = pl.cdiv(max_disp + 1, 128) * 128   # aligned lane halo
    th = min(tile_h, pl.cdiv(h, 8) * 8)
    tw = min(tile_w, pl.cdiv(w, 128) * 128)
    hp = pl.cdiv(h, th) * th
    wp = pl.cdiv(w, tw) * tw

    # Zero-pad: halo on all sides plus tiling round-up.  Padded values are
    # never selected (masks guarantee in-domain indices); they only make the
    # window DMAs unconditionally in-bounds.
    fpad = jnp.pad(field, ((0, 0), (pr, pr + hp - h), (pc, pc + wp - w)))
    vpad = jnp.pad(vel, ((0, 0), (0, hp - h), (0, wp - w)))

    kernel = functools.partial(
        _advect_kernel, dt=dt, max_disp=max_disp, tile_h=th, tile_w=tw,
        pr=pr, pc=pc, h=h, w=w, no_slip=no_slip,
        static_unroll=static_unroll)

    out = pl.pallas_call(
        kernel,
        grid=(hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((2, th, tw), lambda r, cl: (0, r, cl),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # padded field, manual DMA
        ],
        out_specs=pl.BlockSpec((c, th, tw), lambda r, cl: (0, r, cl),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), field.dtype),
        scratch_shapes=(
            [pltpu.VMEM((c, th + 2 * pr, tw + 2 * pc), fpad.dtype)]
            + ([pltpu.VMEM((th, tw), jnp.float32)] if static_unroll else [])
            + [pltpu.SemaphoreType.DMA]
        ),
    )(vpad, fpad)

    out = out[:, :h, :w]
    return out[0] if squeeze else out
