"""3D divergence / gradient-subtract Pallas kernels.

XLA lowers the rank-polymorphic concat-shift stencils (``ops/fd.py``) to
pad/slice chains that run far below bandwidth on 3D grids (~20 ms each at
256^3, vs a ~0.8 ms roofline).  These kernels use the ``sor3d`` folded-
window pattern — one (tile+1-ring) DMA per program, z-neighbors as
plane-stride row shifts — and evaluate the reference BCs from global
coordinates:

* divergence: reflected ghost velocity at the walls (``finitediff.cpp:
  9-31``) — the out-of-domain neighbor contributes ``-v`` of the center;
* gradient-subtract: Neumann pressure clamp (``finitediff.cpp:41-73``) —
  the out-of-domain pressure neighbor is the center value.

Accumulation order matches ``ops.fd``: per-axis ``(fwd - bwd)`` terms
summed axis 0, 1, 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rb_common import _iota2, fold_planes

LANE = 128
PR = 8  # aligned row halo (1 ring used)


def _fold(win_vmem, ch, nz):
    return fold_planes(win_vmem, nz, ch=ch)


def _fold1(win_vmem, nz):
    return fold_planes(win_vmem, nz)


def _coords(z0, row0, col0, nz, rh, wl, d, h, w):
    R = nz * rh
    rho = _iota2((R, wl), 0)
    gz = z0 - 1 + jnp.floor_divide(rho, rh)
    gi = row0 - PR + rho % rh
    gj = col0 - LANE + _iota2((R, wl), 1)
    masks = ((gz == 0, gz == d - 1), (gi == 0, gi == h - 1),
             (gj == 0, gj == w - 1))
    return masks


def _shifts(x, rh):
    """(up, dn) per axis in folded space: z = +-rh rows, i = +-1 rows,
    j = +-1 lanes; out-of-window values are zero (they only feed cropped
    halo outputs)."""
    R, wl = x.shape
    zpl = jnp.zeros((rh, wl), x.dtype)
    zrow = jnp.zeros((1, wl), x.dtype)
    zcol = jnp.zeros((R, 1), x.dtype)
    z_up = jnp.concatenate([zpl, x[:-rh, :]], axis=0)
    z_dn = jnp.concatenate([x[rh:, :], zpl], axis=0)
    i_up = jnp.concatenate([zrow, x[:-1, :]], axis=0)
    i_dn = jnp.concatenate([x[1:, :], zrow], axis=0)
    j_up = jnp.concatenate([zcol, x[:, :-1]], axis=1)
    j_dn = jnp.concatenate([x[:, 1:], zcol], axis=1)
    return ((z_up, z_dn), (i_up, i_dn), (j_up, j_dn))


def _div3d_kernel(v_hbm, out_ref, vwin, sem, *, dx, tile_d, tile_h, tile_w,
                  d, h, w):
    zi, r, c = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    z0, row0, col0 = zi * tile_d, r * tile_h, c * tile_w
    nz = tile_d + 2
    rh = tile_h + 2 * PR
    wl = tile_w + 2 * LANE
    dma = pltpu.make_async_copy(
        v_hbm.at[:, pl.ds(z0, nz), pl.ds(row0, rh), pl.ds(col0, wl)],
        vwin, sem)
    dma.start()
    masks = _coords(z0, row0, col0, nz, rh, wl, d, h, w)
    dma.wait()

    f32 = jnp.float32
    flow = None
    for ax in range(3):
        v = _fold(vwin, ax, nz)
        (lo_m, hi_m) = masks[ax]
        up, dn = _shifts(v, rh)[ax]
        term = (jnp.where(hi_m, -v, dn) - jnp.where(lo_m, -v, up))
        flow = term if flow is None else flow + term
    div = flow * f32(1.0 / (2.0 * dx))
    for z in range(tile_d):
        r0 = (1 + z) * rh + PR
        out_ref[z] = div[r0:r0 + tile_h, LANE:LANE + tile_w].astype(
            out_ref.dtype)


def _grad3d_kernel(p_hbm, vblk_ref, out_ref, pwin, sem, *, dx, tile_d,
                   tile_h, tile_w, d, h, w):
    zi, r, c = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    z0, row0, col0 = zi * tile_d, r * tile_h, c * tile_w
    nz = tile_d + 2
    rh = tile_h + 2 * PR
    wl = tile_w + 2 * LANE
    dma = pltpu.make_async_copy(
        p_hbm.at[pl.ds(z0, nz), pl.ds(row0, rh), pl.ds(col0, wl)],
        pwin, sem)
    dma.start()
    masks = _coords(z0, row0, col0, nz, rh, wl, d, h, w)
    dma.wait()

    f32 = jnp.float32
    p = _fold1(pwin, nz)
    shifts = _shifts(p, rh)
    inv = f32(1.0 / (2.0 * dx))
    for ax in range(3):
        lo_m, hi_m = masks[ax]
        up, dn = shifts[ax]
        grad = (jnp.where(hi_m, p, dn) - jnp.where(lo_m, p, up)) * inv
        for z in range(tile_d):
            r0 = (1 + z) * rh + PR
            g = grad[r0:r0 + tile_h, LANE:LANE + tile_w]
            out_ref[ax, z] = (vblk_ref[ax, z].astype(f32) - g).astype(
                out_ref.dtype)


def _pad3(x, dp, hp, wp):
    bd, bh, bw = x.shape[-3:]
    pads = ((1, 1 + dp - bd), (PR, PR + hp - bh), (LANE, LANE + wp - bw))
    if x.ndim == 4:
        pads = ((0, 0),) + pads
    return jnp.pad(x, pads)


@functools.partial(jax.jit, static_argnames=("dx", "tile_d", "tile_h",
                                             "tile_w"))
def divergence3d_pallas(vel: jax.Array, dx: float = 1.0, tile_d: int = 16,
                        tile_h: int = 32, tile_w: int = 512) -> jax.Array:
    """Kernel replacement for ``ops.fd.divergence`` on 3D grids (f32)."""
    _, bd, bh, bw = vel.shape
    td = min(tile_d, bd)
    th = min(tile_h, pl.cdiv(bh, 8) * 8)
    tw = min(tile_w, pl.cdiv(bw, LANE) * LANE)
    dp = pl.cdiv(bd, td) * td
    hp = pl.cdiv(bh, th) * th
    wp = pl.cdiv(bw, tw) * tw
    vpad = _pad3(vel, dp, hp, wp)
    kernel = functools.partial(_div3d_kernel, dx=dx, tile_d=td, tile_h=th,
                               tile_w=tw, d=bd, h=bh, w=bw)
    win = (3, td + 2, th + 2 * PR, tw + 2 * LANE)
    out = pl.pallas_call(
        kernel,
        grid=(dp // td, hp // th, wp // tw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((td, th, tw), lambda z, r, c: (z, r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dp, hp, wp), vel.dtype),
        scratch_shapes=[pltpu.VMEM(win, vpad.dtype),
                        pltpu.SemaphoreType.DMA],
    )(vpad)
    return out[:bd, :bh, :bw]


@functools.partial(jax.jit, static_argnames=("dx", "tile_d", "tile_h",
                                             "tile_w"))
def subtract_gradient3d_pallas(vel: jax.Array, p: jax.Array,
                               dx: float = 1.0, tile_d: int = 16,
                               tile_h: int = 32,
                               tile_w: int = 512) -> jax.Array:
    """Kernel replacement for ``ops.fd.subtract_gradient`` on 3D grids."""
    _, bd, bh, bw = vel.shape
    td = min(tile_d, bd)
    th = min(tile_h, pl.cdiv(bh, 8) * 8)
    tw = min(tile_w, pl.cdiv(bw, LANE) * LANE)
    dp = pl.cdiv(bd, td) * td
    hp = pl.cdiv(bh, th) * th
    wp = pl.cdiv(bw, tw) * tw
    ppad = _pad3(p, dp, hp, wp)
    vpad = jnp.pad(vel, ((0, 0), (0, dp - bd), (0, hp - bh), (0, wp - bw)))
    kernel = functools.partial(_grad3d_kernel, dx=dx, tile_d=td, tile_h=th,
                               tile_w=tw, d=bd, h=bh, w=bw)
    win = (td + 2, th + 2 * PR, tw + 2 * LANE)
    out = pl.pallas_call(
        kernel,
        grid=(dp // td, hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, td, th, tw), lambda z, r, c: (0, z, r, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, td, th, tw), lambda z, r, c: (0, z, r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, dp, hp, wp), vel.dtype),
        scratch_shapes=[pltpu.VMEM(win, ppad.dtype),
                        pltpu.SemaphoreType.DMA],
    )(ppad, vpad)
    return out[:, :bd, :bh, :bw]
