"""Pallas TPU kernel for 3D semi-Lagrangian advection (the 256^3 smoke's
hot op; BASELINE config 5).

XLA's TPU gather runs at ~1e8 points/s, so advecting five 256^3 fields
(velocity x3 + density + temperature) through it costs ~0.8 s/step.  This
kernel extends the 2D panel kernel (ops/pallas/advect.py) by one axis:

* each program owns ``tile_d`` output planes x a row tile; it DMAs the
  (planes + z-halo, rows + row-halo, cols + lane-halo) window into VMEM;
* the trilinear sample decomposes into a *tile-gated* loop over integer
  z-shifts (vertical velocity is smooth, so a tile spans few z-shifts) and,
  inside, the 2D kernel's per-panel-gated row-shift loop with 2-panel
  hardware column gathers;
* boundary semantics match ``ops.advect.sample_linear``: clamped-coordinate
  trilinear == edge collapse, no-slip discount from unclamped coords.

Displacements beyond ``max_disp`` cells are clamped per axis (CFL clamp),
like the 2D kernel.  bfloat16 fields use the packed-pair single-gather
trick (bit-exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_LH = 64            # lane halo (2-panel gather band, max_disp <= 62)


def _bitcast_u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _bitcast_f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _advect3d_kernel(goff_ref, vel_ref, field_hbm, out_ref, src_vmem,
                     acc_vmem, sem, *, dt, max_disp, tile_d, tile_h, tile_w,
                     pz, pr, d, h, w, bh, no_slip, pack):
    """One (plane-tile, row-tile, col-tile) program; all channels.

    src_vmem: (c, tile_d + 2*pz, tile_h + 2*pr, tile_w + 2*_LH);
    acc_vmem: (c * tile_h, tile_w) f32, reused per output plane.
    """
    n_ch = src_vmem.shape[0]
    ww = tile_w + 2 * _LH
    zi = pl.program_id(0)
    r = pl.program_id(1)
    cidx = pl.program_id(2)
    z0 = zi * tile_d
    row0 = r * tile_h
    col0 = cidx * tile_w

    dma = pltpu.make_async_copy(
        field_hbm.at[:, pl.ds(z0, tile_d + 2 * pz),
                     pl.ds(row0, tile_h + 2 * pr), pl.ds(col0, ww)],
        src_vmem,
        sem,
    )
    dma.start()

    f32 = jnp.float32
    i_loc = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    j_loc = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    # block-local + (traced) block offset — zero single-chip, shard origin
    # under shard_map (the vertical axis stays shard-local)
    i_glob = (i_loc + row0 + goff_ref[0, 0]).astype(f32)
    j_glob = (j_loc + col0 + goff_ref[0, 1]).astype(f32)
    i_blk = (i_loc + row0).astype(f32)

    for dz in range(tile_d):
        zg = z0 + dz
        zf = f32(zg)
        v0 = vel_ref[0, dz].astype(f32)
        v1 = vel_ref[1, dz].astype(f32)
        v2 = vel_ref[2, dz].astype(f32)
        sz_raw = zf - v0 * f32(dt)
        si_raw = i_glob - v1 * f32(dt)
        sj_raw = j_glob - v2 * f32(dt)

        # CFL clamp per axis, then the domain clamp (edge collapse)
        sz = jnp.clip(jnp.clip(sz_raw, zf - max_disp, zf + max_disp),
                      0.0, f32(d - 1))
        si = jnp.clip(jnp.clip(si_raw, i_glob - max_disp, i_glob + max_disp),
                      0.0, f32(h - 1))
        sj = jnp.clip(jnp.clip(sj_raw, j_glob - max_disp, j_glob + max_disp),
                      0.0, f32(w - 1))
        z0f = jnp.clip(jnp.floor(sz), 0.0, f32(d - 2))
        i0 = jnp.clip(jnp.floor(si), 0.0, f32(h - 2))
        j0 = jnp.clip(jnp.floor(sj), 0.0, f32(w - 2))
        dzf = sz - z0f
        dif = si - i0
        djf = sj - j0

        rel_z = (z0f - zf).astype(jnp.int32)
        rel_i = (i0 - i_glob).astype(jnp.int32)
        lj = (j0 - goff_ref[0, 1].astype(f32)
              - f32(col0 - _LH)).astype(jnp.int32)

        row_valid = (i_glob <= f32(h - 1)) & (i_blk <= f32(bh - 1))
        masked_rz = jnp.where(row_valid, rel_z, 0)
        masked_ri = jnp.where(row_valid, rel_i, 0)
        # tile-wide z-shift range (vertical velocity is smooth over a tile)
        zmin = jnp.min(masked_rz)
        zmax = jnp.max(masked_rz)
        # ... and tile-wide row-shift range: gates each row slot before any
        # per-panel guard runs (the 2D "sloop" restructure — guard
        # machinery costs ~44 us per empty slot across a 4096^2-equivalent
        # grid, measured round 4)
        imin_t = jnp.min(masked_ri)
        imax_t = jnp.max(masked_ri)

        wz1 = dzf
        wz0 = 1.0 - dzf
        wi1 = dif
        wi0 = 1.0 - dif

        if dz == 0:
            dma.wait()

        acc_vmem[...] = jnp.zeros(acc_vmem.shape, f32)

        # per-panel quantities (independent of the z-shift): hoist once
        n_out = tile_w // LANE
        panels = []
        for po in range(n_out):
            sl = slice(po * LANE, (po + 1) * LANE)
            lj_p = lj[:, sl]
            ent = {
                "sl": sl,
                "rz_p": rel_z[:, sl], "ri_p": rel_i[:, sl],
                "wz0_p": wz0[:, sl], "wz1_p": wz1[:, sl],
                "wi0_p": wi0[:, sl], "wi1_p": wi1[:, sl],
                "dj_p": djf[:, sl], "one_m_dj": 1.0 - djf[:, sl],
                "mod_p": jnp.bitwise_and(lj_p, LANE - 1),
                # Every valid output's source column lands in panel po or
                # po+1 (the _LH=64 window guarantee — clamped j0 keeps lj
                # within [c+LH-max_disp, c+LH+max_disp+1]), so one one-hot
                # select between the two panel gathers replaces the
                # mask-and-accumulate pipeline (same restructure as the 2D
                # panel kernel).
                "e0": jnp.floor_divide(lj_p, LANE) == po,
                "smin": jnp.min(masked_ri[:, sl]),
                "smax": jnp.max(masked_ri[:, sl]),
            }
            panels.append(ent)

        for sz_s in range(-max_disp, max_disp + 2):
            @pl.when(jnp.logical_and(zmin <= sz_s, sz_s <= zmax + 1))
            def _(sz_s=sz_s, dz=dz):
                # source planes for this z-shift, packed once per channel
                xs = []
                xs_next = []   # one-lane-left-rolled copies (f32 path): the
                # (k+1)-tap gathers the rolled plane with the SAME index
                # vector (xs_next[:, k] == xs[:, k+1]; the wrap lane ww-1 is
                # never indexed by a valid output)
                for ch in range(n_ch):
                    x = src_vmem[ch, pz + dz + sz_s].astype(f32)
                    if pack:
                        nxt = pltpu.roll(x, ww - 1, 1)
                        x = _bitcast_f32(_bitcast_u32(x)
                                         | (_bitcast_u32(nxt) >> 16))
                    else:
                        xs_next.append(pltpu.roll(x, ww - 1, 1))
                    xs.append(x)
                # disjoint masks: nested select == masked sum bit-exactly
                zcontribs = [jnp.where(
                    p["rz_p"] == sz_s, p["wz0_p"],
                    jnp.where(p["rz_p"] == sz_s - 1, p["wz1_p"], 0.0))
                    for p in panels]
                for s in range(-max_disp, max_disp + 2):
                    @pl.when(jnp.logical_and(imin_t <= s, s <= imax_t + 1))
                    def _(s=s, xs=xs, xs_next=xs_next, zcontribs=zcontribs):
                        for po in range(n_out):
                            p = panels[po]

                            @pl.when(jnp.logical_and(p["smin"] <= s,
                                                     s <= p["smax"] + 1))
                            def _(s=s, po=po, p=p, xs=xs, xs_next=xs_next,
                                  zcontrib=zcontribs[po]):
                                contrib = zcontrib * jnp.where(
                                    p["ri_p"] == s, p["wi0_p"],
                                    jnp.where(p["ri_p"] == s - 1,
                                              p["wi1_p"], 0.0))
                                for ch in range(n_ch):
                                    rows_s = xs[ch][pr + s:pr + s + tile_h, :]
                                    pan0 = rows_s[:, po * LANE:(po + 1) * LANE]
                                    pan1 = rows_s[:, (po + 1) * LANE:
                                                  (po + 2) * LANE]
                                    if pack:
                                        gu = jnp.where(
                                            p["e0"],
                                            _bitcast_u32(jnp.take_along_axis(
                                                pan0, p["mod_p"], axis=1)),
                                            _bitcast_u32(jnp.take_along_axis(
                                                pan1, p["mod_p"], axis=1)))
                                        vlo = _bitcast_f32(
                                            gu & jnp.uint32(0xFFFF0000))
                                        vhi = _bitcast_f32(gu << 16)
                                        colv = (vlo * p["one_m_dj"]
                                                + vhi * p["dj_p"])
                                    else:
                                        rows_n = xs_next[ch][
                                            pr + s:pr + s + tile_h, :]
                                        g0 = jnp.where(
                                            p["e0"],
                                            jnp.take_along_axis(
                                                pan0, p["mod_p"], axis=1),
                                            jnp.take_along_axis(
                                                pan1, p["mod_p"], axis=1))
                                        g1 = jnp.where(
                                            p["e0"],
                                            jnp.take_along_axis(
                                                rows_n[:, po * LANE:
                                                       (po + 1) * LANE],
                                                p["mod_p"], axis=1),
                                            jnp.take_along_axis(
                                                rows_n[:, (po + 1) * LANE:
                                                       (po + 2) * LANE],
                                                p["mod_p"], axis=1))
                                        colv = (g0 * p["one_m_dj"]
                                                + g1 * p["dj_p"])
                                    acc_vmem[ch * tile_h:(ch + 1) * tile_h,
                                             p["sl"]] += colv * contrib

        if no_slip:
            def axis_factor(raw, n):
                under = raw < 0
                over = raw >= n - 1
                overshoot = jnp.where(under, -raw, raw - f32(n - 1))
                return jnp.where(
                    under | over,
                    jnp.where(overshoot < 0.5, 1.0 - 2.0 * overshoot, 0.0),
                    1.0,
                )
            ns = (axis_factor(sz_raw, d) * axis_factor(si_raw, h)
                  * axis_factor(sj_raw, w))
        for ch in range(n_ch):
            a = acc_vmem[ch * tile_h:(ch + 1) * tile_h, :]
            if no_slip:
                a = a * ns
            out_ref[ch, dz, :, :] = a.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dt", "no_slip", "max_disp", "tile_d", "tile_h",
                     "tile_w", "global_shape", "halo"))
def advect3d_pallas(field: jax.Array, vel: jax.Array, dt: float,
                    no_slip: bool, max_disp: int = 4, tile_d: int = 4,
                    tile_h: int = 16, tile_w: int = 1024,
                    global_offset: jax.Array | None = None,
                    global_shape=None, halo: int = 0):
    """Drop-in replacement for ``ops.advect.advect`` on large 3D grids.

    field: ``[D, H, W]`` or ``[C, D, H, W]``; vel: ``[3, D, H, W]``.
    Displacements are clamped to ``max_disp`` cells per axis (CFL clamp).

    Block mode (the ``shard_map`` path): when ``global_offset`` — a traced
    ``(2,)`` int32 array of (row, col) shard origins — is given, ``field``
    is one shard's local block with ``halo >= max_disp + 1`` exchanged
    ghost cells on the two horizontal axes (the vertical axis stays
    shard-local), and ``global_shape`` is the full (D, H, W) extent for the
    boundary clamps.
    """
    if max_disp > _LH - 2:
        raise ValueError(f"max_disp={max_disp} exceeds the 2-panel gather "
                         f"band (max_disp <= {_LH - 2})")
    block_mode = global_offset is not None
    if block_mode and halo < max_disp + 1:
        raise ValueError(f"block mode needs halo >= max_disp+1 ghost cells "
                         f"({halo} < {max_disp + 1})")
    squeeze = field.ndim == 3
    if squeeze:
        field = field[None]
    c = field.shape[0]
    if block_mode:
        d = field.shape[1]
        bh, bw = field.shape[2] - 2 * halo, field.shape[3] - 2 * halo
        dg, h, w = global_shape
        if dg != d:
            raise ValueError("the vertical axis must be shard-local "
                             f"(field D={d} != global D={dg})")
    else:
        _, d, bh, bw = field.shape
        h, w = bh, bw
        halo = 0
    pz = max_disp + 1                        # leading dim: no alignment
    pr = pl.cdiv(max_disp + 1, 8) * 8
    if halo > min(pr, _LH):
        raise ValueError(f"halo={halo} exceeds the aligned kernel halo "
                         f"(pr={pr}, lane halo {_LH})")
    td = min(tile_d, d)
    th = min(tile_h, pl.cdiv(bh, 8) * 8)
    tw = min(tile_w, pl.cdiv(bw, 128) * 128)
    dp = pl.cdiv(d, td) * td
    hp = pl.cdiv(bh, th) * th
    wp = pl.cdiv(bw, tw) * tw
    goff = (jnp.zeros((1, 2), jnp.int32) if global_offset is None
            else global_offset.astype(jnp.int32).reshape(1, 2))

    fpad = jnp.pad(field, ((0, 0), (pz, pz + dp - d),
                           (pr - halo, pr - halo + hp - bh),
                           (_LH - halo, _LH - halo + wp - bw)))
    vpad = jnp.pad(vel, ((0, 0), (0, dp - d), (0, hp - bh), (0, wp - bw)))
    pack = field.dtype == jnp.bfloat16

    kernel = functools.partial(
        _advect3d_kernel, dt=dt, max_disp=max_disp, tile_d=td, tile_h=th,
        tile_w=tw, pz=pz, pr=pr, d=d, h=h, w=w, bh=bh, no_slip=no_slip,
        pack=pack)

    out = pl.pallas_call(
        kernel,
        grid=(dp // td, hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((1, 2), lambda z, r, cl: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, td, th, tw), lambda z, r, cl: (0, z, r, cl),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((c, td, th, tw), lambda z, r, cl: (0, z, r, cl),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, dp, hp, wp), field.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, td + 2 * pz, th + 2 * pr, tw + 2 * _LH),
                       fpad.dtype),
            pltpu.VMEM((c * th, tw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(goff, vpad, fpad)

    out = out[:, :d, :bh, :bw]
    return out[0] if squeeze else out
