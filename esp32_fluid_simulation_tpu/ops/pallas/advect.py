"""Pallas TPU kernel for semi-Lagrangian advection.

Why: the backtrace sample is a 2D gather, and XLA's TPU gather runs at
~120M points/s — it was ~70% of the whole step at 4096^2.  TPUs have no fast
arbitrary gather, but the backtrace displacement is physically bounded by the
CFL number; this kernel exploits that:

* the grid is tiled; each program DMAs its (tile + halo) window of the field
  from HBM into VMEM.  The halo covers ``max_disp + 1`` cells and is rounded
  up to hardware tile multiples (8 sublanes / 128 lanes) so every VMEM shape
  is aligned;
* the bilinear gather becomes a **select-sum over integer shifts**: for every
  integer offset (s, t) actually present in the tile (dynamic fori_loop over
  the tile's min/max offsets — typically a 2x2..4x4 range away from fresh
  impulses), accumulate ``weight(s,t) * window(s,t)``.  The shifted window is
  produced with ``tpu.dynamic_rotate`` (pltpu.roll with a traced shift) plus
  a static slice — Mosaic has no unaligned dynamic vector loads, but it does
  have dynamic lane/sublane rotates.  The weight merges the four bilinear
  corner contributions that map to that shift.  All VPU element-wise ops, no
  gather anywhere;
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


def _cdiv(a, b):
    return -(-a // b)


def _advect_kernel(vel_ref, field_hbm, out_ref, src_vmem, sem,
                   *, dt, max_disp, tile_h, tile_w, pr, pc, h, w, no_slip):
    """One (channel, row-tile, col-tile) program.

    pr/pc: aligned halo widths (rows/cols), both > max_disp.
    """
    r = pl.program_id(1)
    cidx = pl.program_id(2)
    row0 = r * tile_h
    col0 = cidx * tile_w

    # Halo-window DMA.  fpad coords: global g -> g + pr (rows) / + pc (cols),
    # so the window starting at (row0, col0) covers global rows
    # [row0 - pr, row0 + tile_h + pr).
    dma = pltpu.make_async_copy(
        field_hbm.at[pl.program_id(0),
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
    rel_j = (j0 - j_glob).astype(jnp.int32)

    smin = jnp.min(rel_i)
    smax = jnp.max(rel_i)
    tmin = jnp.min(rel_j)
    tmax = jnp.max(rel_j)

    dma.wait()
    src = src_vmem[:].astype(f32)

    w00 = (1.0 - di) * (1.0 - dj)
    w01 = (1.0 - di) * dj
    w10 = di * (1.0 - dj)
    w11 = di * dj

    # Mosaic cannot vector-load at unaligned dynamic offsets, but it CAN
    # rotate a vector by a dynamic amount (tpu.dynamic_rotate) — so each
    # integer shift is a roll of the haloed tile + a static aligned slice.
    # Rolls never wrap DMA'd data out of reach: |s| <= max_disp < pr.
    def t_body(t, carry):
        acc, rows_s, s = carry
        win = pltpu.roll(rows_s, -t, 1)[:, pc:pc + tile_w]
        # merge the 4 bilinear corners that hit this shifted window
        ms = rel_i == s
        ms1 = rel_i == s - 1
        mt = rel_j == t
        mt1 = rel_j == t - 1
        wgt = (jnp.where(ms & mt, w00, 0.0)
               + jnp.where(ms & mt1, w01, 0.0)
               + jnp.where(ms1 & mt, w10, 0.0)
               + jnp.where(ms1 & mt1, w11, 0.0))
        return acc + win * wgt, rows_s, s

    def s_body(s, acc):
        rows_s = pltpu.roll(src, -s, 0)[pr:pr + tile_h, :]
        acc, _, _ = jax.lax.fori_loop(tmin, tmax + 2, t_body,
                                      (acc, rows_s, s))
        return acc

    acc = jnp.zeros((tile_h, tile_w), f32)
    acc = jax.lax.fori_loop(smin, smax + 2, s_body, acc)

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
        acc = acc * axis_factor(si_raw, h) * axis_factor(sj_raw, w)

    out_ref[0, :, :] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dt", "no_slip", "max_disp", "tile_h", "tile_w"))
def advect_pallas(field: jax.Array, vel: jax.Array, dt: float, no_slip: bool,
                  max_disp: int = 12, tile_h: int = 128, tile_w: int = 1024):
    """Drop-in replacement for ``ops.advect.advect`` on large 2D grids.

    field: ``[H, W]`` or ``[C, H, W]``; vel: ``[2, H, W]``.  Displacements
    are clamped to ``max_disp`` cells (CFL clamp).
    """
    squeeze = field.ndim == 2
    if squeeze:
        field = field[None]
    c, h, w = field.shape
    pr = _cdiv(max_disp + 1, 8) * 8       # aligned sublane halo
    pc = _cdiv(max_disp + 1, 128) * 128   # aligned lane halo
    th = min(tile_h, _cdiv(h, 8) * 8)
    tw = min(tile_w, _cdiv(w, 128) * 128)
    hp = _cdiv(h, th) * th
    wp = _cdiv(w, tw) * tw

    # Zero-pad: halo on all sides plus tiling round-up.  Padded values are
    # never selected (masks guarantee in-domain indices); they only make the
    # window DMAs unconditionally in-bounds.
    fpad = jnp.pad(field, ((0, 0), (pr, pr + hp - h), (pc, pc + wp - w)))
    vpad = jnp.pad(vel, ((0, 0), (0, hp - h), (0, wp - w)))

    kernel = functools.partial(
        _advect_kernel, dt=dt, max_disp=max_disp, tile_h=th, tile_w=tw,
        pr=pr, pc=pc, h=h, w=w, no_slip=no_slip)

    out = pl.pallas_call(
        kernel,
        grid=(c, hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((2, th, tw), lambda ci, r, cl: (0, r, cl),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded field, manual DMA
        ],
        out_specs=pl.BlockSpec((1, th, tw), lambda ci, r, cl: (ci, r, cl),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), field.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * pr, tw + 2 * pc), fpad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(vpad, fpad)

    out = out[:, :h, :w]
    return out[0] if squeeze else out
