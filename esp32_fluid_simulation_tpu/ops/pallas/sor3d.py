"""Packed-checkerboard red-black SOR in 3D (the 256^3 smoke's pressure
solve; BASELINE config 5, VERDICT r2 missing #2).

The composed jnp path runs ``2*iters`` full-grid masked updates — each a
round trip of ``p`` (and ``d``) through HBM.  This kernel keeps a
``(tile_d, tile_h, tile_w)`` block's whole sweep *chunk* in VMEM:

* each program DMAs a ``(tile_d+2*pz, tile_h+2*pr, tile_w+2*pc)`` window of
  ``d`` and ``p`` and **folds** it to 2D ``(planes*rows, lanes)`` — the
  z-neighbor becomes a row shift by the plane stride ``Rhw``, so all six
  face neighbors are 2D shifts and the 2D packed-checkerboard machinery
  (``rb_common``) applies with one generalization: the checkerboard parity
  ``(k+i+j) % 2`` is not affine in the folded row, so pack/unpack take a
  per-row parity *array*;
* cross-plane row shifts at plane boundaries read another plane's halo rows
  — wrong values, but strictly outside the trapezoidal validity horizon
  (ring r of the halo is garbage after r half-sweeps anyway, exactly like
  the 2D kernel's zero-concat window edges), so the owned tile is exact;
* ``iters`` is split into chunks of ``chunk`` sweeps per launch: halo =
  ``2*chunk`` rings per side bounds the window growth in all three axes
  (3D halos are volumetrically expensive; the chunk trades one extra
  ``p`` HBM round trip per chunk for an O(chunk) window).

Bit-compatibility: same accumulation order as ``ops.poisson.sor_sweep``
(axis 0 lo/hi, axis 1 lo/hi, axis 2 lo/hi), same variable Neumann diagonal
``-1/a_ii`` with a_ii in {3..6} (``poisson.cpp:63-90`` generalized), same
zero init and even-parity-first ordering.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rb_common import (_iota2, deinterleave_parity, fold_planes,
                        interleave_parity)

LANE = 128


def _fold(win_vmem, nz, rh, wl):
    """Read a (nz, rh, wl) VMEM window as a folded (nz*rh, wl) f32 value."""
    return fold_planes(win_vmem, nz)


def _sor3d_kernel(goff_ref, d_hbm, p_hbm, pout_hbm, dwin, pwin, tout,
                  sem_d, sem_p, sem_o, *, sweeps, omega, dx, tile_d,
                  tile_h, tile_w, pz, pr, pc, gd, gh, gw):
    zi = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)
    z0 = zi * tile_d
    row0 = r * tile_h
    col0 = c * tile_w
    nz = tile_d + 2 * pz
    rh = tile_h + 2 * pr
    wl = tile_w + 2 * pc

    dma_d = pltpu.make_async_copy(
        d_hbm.at[pl.ds(z0, nz), pl.ds(row0, rh), pl.ds(col0, wl)],
        dwin, sem_d)
    dma_p = pltpu.make_async_copy(
        p_hbm.at[pl.ds(z0, nz), pl.ds(row0, rh), pl.ds(col0, wl)],
        pwin, sem_p)
    dma_d.start()
    dma_p.start()

    f32 = jnp.float32
    R = nz * rh
    # folded global coordinates: row rho -> plane rho//rh, grid row rho%rh
    rho = _iota2((R, wl), 0)
    gz = z0 - pz + goff_ref[0, 0] + jnp.floor_divide(rho, rh)
    gi = row0 - pr + goff_ref[0, 1] + rho % rh
    gj = col0 - pc + goff_ref[0, 2] + _iota2((R, wl), 1)
    in_dom = ((gz >= 0) & (gz < gd) & (gi >= 0) & (gi < gh)
              & (gj >= 0) & (gj < gw))

    # per-row parity of (k + i + j0): the packed checkerboard's row offset
    gj0s = col0 - pc + goff_ref[0, 2]
    rowpar = ((gz + gi + gj0s) % 2)[:, :LANE]   # col-constant row parity

    dma_d.wait()
    dma_p.wait()
    dfold = jnp.where(in_dom, _fold(dwin, nz, rh, wl), 0.0)
    pfold = jnp.where(in_dom, _fold(pwin, nz, rh, wl), 0.0)
    dxd = f32(dx) * dfold

    dE, dO = deinterleave_parity(dxd, None, rowpar=rowpar)
    pE, pO = deinterleave_parity(pfold, None, rowpar=rowpar)
    inE, inO = deinterleave_parity(in_dom.astype(jnp.int32), None,
                                   rowpar=rowpar)
    inE = inE > 0
    inO = inO > 0
    wwp = dE.shape[1]

    # packed coordinates + Neumann diagonal per parity array
    rhoP = _iota2((R, wwp), 0)
    gzP = z0 - pz + goff_ref[0, 0] + jnp.floor_divide(rhoP, rh)
    giP = row0 - pr + goff_ref[0, 1] + rhoP % rh
    aP = (gzP + giP + gj0s) % 2                 # (R, wwp) row parity
    lane = _iota2((R, wwp), 1)
    gjE = gj0s + 2 * lane + aP
    gjO = gj0s + 2 * lane + 1 - aP

    def consts(gjP):
        aii = (6
               - (gzP == 0).astype(jnp.int32) - (gzP == gd - 1).astype(
                   jnp.int32)
               - (giP == 0).astype(jnp.int32) - (giP == gh - 1).astype(
                   jnp.int32)
               - (gjP == 0).astype(jnp.int32) - (gjP == gw - 1).astype(
                   jnp.int32))
        return jnp.where(
            aii == 6, f32(np.float32(-1.0 / 6.0)),
            jnp.where(aii == 5, f32(np.float32(-1.0 / 5.0)),
                      jnp.where(aii == 4, f32(np.float32(-0.25)),
                                f32(np.float32(-1.0 / 3.0)))))

    neg_invE = consts(gjE)
    neg_invO = consts(gjO)

    wgt = f32(omega)
    one_m_w = f32(1.0 - omega)
    zrow = jnp.zeros((1, wwp), f32)
    zpl = jnp.zeros((rh, wwp), f32)
    zcol = jnp.zeros((R, 1), f32)
    a0 = aP == 0

    def rsh(x):
        return jnp.concatenate([zcol, x[:, :-1]], axis=1)   # m-1

    def lsh(x):
        return jnp.concatenate([x[:, 1:], zcol], axis=1)    # m+1

    def ish(x):
        up = jnp.concatenate([zrow, x[:-1, :]], axis=0)
        dn = jnp.concatenate([x[1:, :], zrow], axis=0)
        return up, dn

    def zsh(x):
        up = jnp.concatenate([zpl, x[:-rh, :]], axis=0)
        dn = jnp.concatenate([x[rh:, :], zpl], axis=0)
        return up, dn

    for half in range(2 * sweeps):
        if half % 2 == 0:   # update even parity (the reference's red)
            zu, zd = zsh(pO)
            iu, idn = ish(pO)
            lf = jnp.where(a0, rsh(pO), pO)
            rt = jnp.where(a0, pO, lsh(pO))
            nb = ((((zu + zd) + iu) + idn) + lf) + rt
            p_new = one_m_w * pE + wgt * (neg_invE * (dE - nb))
            pE = jnp.where(inE, p_new, 0.0)
        else:
            zu, zd = zsh(pE)
            iu, idn = ish(pE)
            lf = jnp.where(a0, pE, rsh(pE))
            rt = jnp.where(a0, lsh(pE), pE)
            nb = ((((zu + zd) + iu) + idn) + lf) + rt
            p_new = one_m_w * pO + wgt * (neg_invO * (dO - nb))
            pO = jnp.where(inO, p_new, 0.0)

    p_full = interleave_parity(pE, pO, None, wl, rowpar=rowpar)
    for z in range(tile_d):
        r0 = (pz + z) * rh + pr
        tout[z] = p_full[r0:r0 + tile_h, pc:pc + tile_w].astype(tout.dtype)
    # write the owned tile back into the SAME padded layout the next chunk
    # launch reads (the halo frame is never written; loads mask it via
    # in_dom) — no crop/re-pad round trip of p between chunks
    dma_o = pltpu.make_async_copy(
        tout,
        pout_hbm.at[pl.ds(pz + z0, tile_d), pl.ds(pr + row0, tile_h),
                    pl.ds(pc + col0, tile_w)],
        sem_o)
    dma_o.start()
    dma_o.wait()


def _sor3d_geometry(shape, halo_sweeps, tile_d, tile_h, tile_w):
    """Tile/pad geometry sized for ``halo_sweeps`` sweeps per launch."""
    bd, bh, bw = shape
    need = 2 * halo_sweeps
    if need > LANE:
        # pz/pr scale with the chunk but the lane halo is one fixed panel;
        # a longer chunk would let edge garbage reach owned columns and
        # return a silently wrong solve (code-review r3)
        raise ValueError(
            f"chunk={halo_sweeps} needs a {need}-lane column halo > the "
            f"fixed {LANE}-lane panel; use chunk <= {LANE // 2}")
    pz = need
    pr = pl.cdiv(need, 8) * 8
    pc = LANE
    td = min(tile_d, bd)
    th = min(tile_h, pl.cdiv(bh, 8) * 8)
    tw = min(tile_w, pl.cdiv(bw, LANE) * LANE)
    dp = pl.cdiv(bd, td) * td
    hp = pl.cdiv(bh, th) * th
    wp = pl.cdiv(bw, tw) * tw
    return td, th, tw, pz, pr, pc, dp, hp, wp


def _sor3d_chunk_padded(dpad, ppad, dx, sweeps, omega, geom, gshape,
                        global_offset=None):
    """One chunk launch on ALREADY-PADDED operands, returning the padded
    layout — consecutive chunks chain without any crop/re-pad round trip
    of ``p`` through HBM (each program writes its owned tile back into the
    same frame; the never-written halo frame is masked to 0 on load via
    ``in_dom``, so its garbage is invisible)."""
    td, th, tw, pz, pr, pc, dp, hp, wp = geom
    gd_, gh_, gw_ = gshape
    goff = (jnp.zeros((1, 3), jnp.int32) if global_offset is None
            else global_offset.astype(jnp.int32).reshape(1, 3))

    kernel = functools.partial(
        _sor3d_kernel, sweeps=sweeps, omega=omega, dx=dx, tile_d=td,
        tile_h=th, tile_w=tw, pz=pz, pr=pr, pc=pc, gd=gd_, gh=gh_, gw=gw_)

    win = (td + 2 * pz, th + 2 * pr, tw + 2 * pc)
    return pl.pallas_call(
        kernel,
        grid=(dp // td, hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((1, 3), lambda z, r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(dpad.shape, dpad.dtype),
        scratch_shapes=[
            pltpu.VMEM(win, dpad.dtype),
            pltpu.VMEM(win, ppad.dtype),
            pltpu.VMEM((td, th, tw), dpad.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(goff, dpad, ppad)


def _sor3d_chunk(d, p, dx, sweeps, omega, tile_d, tile_h, tile_w,
                 global_offset=None, global_shape=None):
    """Unpadded-in/unpadded-out single chunk (the sharded block-mode entry
    point); single-device multi-chunk solves use the padded chain in
    ``sor3d_packed_pallas`` instead."""
    gshape = d.shape if global_shape is None else global_shape
    bd, bh, bw = d.shape
    geom = _sor3d_geometry(d.shape, sweeps, tile_d, tile_h, tile_w)
    td, th, tw, pz, pr, pc, dp, hp, wp = geom
    pads = ((pz, pz + dp - bd), (pr, pr + hp - bh), (pc, pc + wp - bw))
    out = _sor3d_chunk_padded(jnp.pad(d, pads), jnp.pad(p, pads), dx,
                              sweeps, omega, geom, gshape,
                              global_offset=global_offset)
    return out[pz:pz + bd, pr:pr + bh, pc:pc + bw]


@functools.partial(jax.jit, static_argnames=("dx", "iters", "omega",
                                             "chunk", "tile_d", "tile_h",
                                             "tile_w"))
def sor3d_packed_pallas(d: jax.Array, dx: float = 1.0, iters: int = 10,
                        omega: float = 1.5, chunk: int = 3,
                        tile_d: int = 16, tile_h: int = 16,
                        tile_w: int = 256) -> jax.Array:
    """Drop-in for ``ops.poisson.sor_solve`` on 3D grids.

    Runs ``iters`` red-black SOR sweeps in chunks of ``chunk`` per kernel
    launch (exact continuation: the sweep sequence is identical to the
    monolithic solve).  f32 only; output matches ``sor_solve`` bit-for-bit
    modulo float reassociation (parity-tested).
    """
    if d.ndim != 3:
        raise ValueError("sor3d_packed_pallas is 3D-only")
    bd, bh, bw = d.shape
    # one fixed padded geometry for every launch (sized for the largest
    # chunk): d is padded ONCE and p lives in the padded layout across all
    # chunk launches — the only crop is the final one
    geom = _sor3d_geometry(d.shape, min(chunk, iters), tile_d, tile_h,
                           tile_w)
    td, th, tw, pz, pr, pc, dp, hp, wp = geom
    pads = ((pz, pz + dp - bd), (pr, pr + hp - bh), (pc, pc + wp - bw))
    dpad = jnp.pad(d, pads)
    ppad = jnp.zeros_like(dpad)
    done = 0
    while done < iters:
        k = min(chunk, iters - done)
        ppad = _sor3d_chunk_padded(dpad, ppad, dx, k, omega, geom, d.shape)
        done += k
    return ppad[pz:pz + bd, pr:pr + bh, pc:pc + bw]
