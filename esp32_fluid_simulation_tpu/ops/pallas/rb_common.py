"""Packed-checkerboard red-black SOR for Mosaic kernels.

The naive in-kernel RB sweep updates one color per half-sweep with a parity
mask — half the VPU lanes compute values that are thrown away.  Packing the
checkerboard into two dense half-width arrays (poisson.cpp:10-12's latent
parallelism, laid out densely) does the same arithmetic on half the lanes:

  E[i, m] = x[i, 2m + a(i)],   O[i, m] = x[i, 2m + 1 - a(i)],
  a(i) = (gi0 + i + gj0) % 2   (the window row's even-cell column offset),

so E always holds the cells with even global (i+j) (the reference's "red",
updated first).  Neighbor access stays local in packed space: up/down keep
the packed column; left/right become a row-parity select between the packed
column and its ±1 shift (derivation in ``packed_rb_solve_full``).
Pack/unpack are per-panel hardware lane gathers (``tpu.dynamic_gather``),
paid once per solve.

Bit-compatibility: per cell the update reads the same operands in the same
accumulation order ``((up + dn) + lf) + rt`` as the full-width kernels and
``ops.poisson.sor_sweep``, so results are bit-identical to the unpacked
kernel.

Mosaic hygiene (v5e compiler crashes found the hard way): no reductions of
sliced expressions, no (rows, 1)-shaped slices/broadcasts — all per-row
quantities are built from ``broadcasted_iota`` plus traced scalars.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

LANE = 128


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def fold_planes(win_vmem, nz, ch=None):
    """Read ``nz`` z-planes of a VMEM window as one folded ``(nz*rows, w)``
    f32 value (the 3D kernels' z-in-sublanes layout; shared by fd3d/sor3d).
    ``ch``: optional leading channel index."""
    src = win_vmem if ch is None else win_vmem[ch]
    planes = [src[z].astype(jnp.float32) for z in range(nz)]
    return jnp.concatenate(planes, axis=0) if nz > 1 else planes[0]


def _row_parity(rows, width, base):
    """(rows, width) int32: (row index + base) % 2, base a traced scalar."""
    return (_iota2((rows, width), 0) + base) % 2


def deinterleave_parity(x, base, rowpar=None):
    """(E, O) with ``E[i, m] = x[i, 2m + a(i)]``, ``O[i, m] = x[i, 2m+1-a(i)]``
    where ``a(i) = (i + base) % 2`` (``base``: traced scalar), or ``a(i) =
    rowpar[i]`` when a (rows, 128) per-row parity array is given (the 3D
    fold, where parity is not affine in the folded row index).

    x: (rows, ww) with ww a multiple of 128.  Output width is ``ww//2``
    rounded up to a 128-lane panel; tail lanes gather nothing and read 0.
    """
    rows, ww = x.shape
    wwh = ww // 2
    wwp = -(-wwh // LANE) * LANE
    outs = []
    for off_sel in (0, 1):   # 0 -> E, 1 -> O
        panels = []
        for po in range(wwp // LANE):
            a = (_row_parity(rows, LANE, base) if rowpar is None
                 else rowpar)
            off = a if off_sel == 0 else 1 - a
            lane = _iota2((rows, LANE), 1)
            j = 2 * (po * LANE + lane) + off        # full-width column
            acc = jnp.zeros((rows, LANE), x.dtype)
            for q in range(2 * po, min(2 * po + 2, ww // LANE)):
                pan = x[:, q * LANE:(q + 1) * LANE]
                g = jnp.take_along_axis(pan, jnp.bitwise_and(j, LANE - 1),
                                        axis=1)
                acc += jnp.where(jnp.floor_divide(j, LANE) == q, g,
                                 jnp.zeros_like(g))
            panels.append(acc)
        outs.append(jnp.concatenate(panels, axis=1) if len(panels) > 1
                    else panels[0])
    return outs[0], outs[1]


def interleave_parity(e, o, base, ww, rowpar=None):
    """Inverse of ``deinterleave_parity``: full[i, j] comes from E where
    ``(a(i) + j) % 2 == 0``, else O; both live at packed column j//2."""
    rows = e.shape[0]
    panels = []
    for po in range(ww // LANE):
        src = po // 2
        lane = _iota2((rows, LANE), 1)
        idx = (LANE // 2) * (po % 2) + jnp.floor_divide(lane, 2)
        ge = jnp.take_along_axis(e[:, src * LANE:(src + 1) * LANE], idx,
                                 axis=1)
        go = jnp.take_along_axis(o[:, src * LANE:(src + 1) * LANE], idx,
                                 axis=1)
        j_full = po * LANE + lane
        rp = (_iota2((rows, LANE), 0) + base) if rowpar is None else rowpar
        even = ((rp + j_full) % 2) == 0
        panels.append(jnp.where(even, ge, go))
    return jnp.concatenate(panels, axis=1) if len(panels) > 1 else panels[0]


def packed_rb_solve_full(dxd, gi0, gj0, h, w, in_dom, iters, omega,
                         member=None):
    """Returns full-width pressure after ``2*iters`` half-sweeps.

    Same math/order as the full-width kernels: zero-ghost neighbor sums in
    ``((up + dn) + lf) + rt`` order, variable Neumann diagonal from global
    edges (``poisson.cpp:63-90``), SOR blend, cells outside ``in_dom``
    forced to 0 each half-sweep.

    dxd: (rows, ww) f32, dx*divergence, zeroed outside the domain;
    gi0/gj0: traced int32 scalars — global coordinates of window (0, 0);
    in_dom: validity mask (domain bounds, possibly tightened to a block's
    halo horizon); h/w: global domain extent.

    ``member``: static (mh, mw) — tiled-domain mode: every (mh, mw) tile of
    the supergrid is an independent domain: the Neumann diagonal uses
    member-local edges and neighbor sums are zeroed across member
    boundaries (each member solves its own Poisson system exactly).
    """
    f32 = jnp.float32
    rows, ww = dxd.shape
    base = (gi0 + gj0) % 2      # traced scalar: parity of window (0, 0)

    dE, dO = deinterleave_parity(dxd, base)
    in_domE, in_domO = deinterleave_parity(in_dom.astype(jnp.int32), base)
    in_domE = in_domE > 0
    in_domO = in_domO > 0
    wwp = dE.shape[1]

    # packed global coordinates and the Neumann diagonal per parity array
    lane = _iota2((rows, wwp), 1)
    a_b = _row_parity(rows, wwp, base)
    giP = _iota2((rows, wwp), 0) + gi0
    gjE = gj0 + 2 * lane + a_b
    gjO = gj0 + 2 * lane + 1 - a_b

    if member is None:
        mh, mw = None, None

        def edges(gjP):
            return (giP == 0, giP == h - 1, gjP == 0, gjP == w - 1)
    else:
        mh, mw = member
        # window coords can be negative (halo): use floor-mod (% in jnp is
        # floor-mod for int32, so negatives wrap correctly)
        gim = giP % mh

        def edges(gjP):
            gjm = gjP % mw
            return (gim == 0, gim == mh - 1, gjm == 0, gjm == mw - 1)

    def consts(gjP):
        i_lo, i_hi, j_lo, j_hi = edges(gjP)
        aii = (4
               - i_lo.astype(jnp.int32) - i_hi.astype(jnp.int32)
               - j_lo.astype(jnp.int32) - j_hi.astype(jnp.int32))
        return jnp.where(
            aii == 4, f32(np.float32(-0.25)),
            jnp.where(aii == 3, f32(np.float32(-1.0 / 3.0)),
                      f32(np.float32(-0.5))))

    neg_invE = consts(gjE)
    neg_invO = consts(gjO)
    if member is not None:
        # neighbor-sum masks: destination cells on a member edge read 0
        # from across the boundary (the zero-ghost semantics, per member)
        mE = (gim == 0, gim == mh - 1, gjE % mw == 0, gjE % mw == mw - 1)
        mO = (gim == 0, gim == mh - 1, gjO % mw == 0, gjO % mw == mw - 1)

    wgt = f32(omega)
    one_m_w = f32(1.0 - omega)
    zrow = jnp.zeros((1, wwp), f32)
    zcol = jnp.zeros((rows, 1), f32)
    a0 = a_b == 0

    def rsh(x):
        return jnp.concatenate([zcol, x[:, :-1]], axis=1)   # value at m-1

    def lsh(x):
        return jnp.concatenate([x[:, 1:], zcol], axis=1)    # value at m+1

    def vsh(x):
        up = jnp.concatenate([zrow, x[:-1, :]], axis=0)
        dn = jnp.concatenate([x[1:, :], zrow], axis=0)
        return up, dn

    def nbr(up, dn, lf, rt, masks):
        if masks is not None:
            i_lo, i_hi, j_lo, j_hi = masks
            up = jnp.where(i_lo, 0.0, up)
            dn = jnp.where(i_hi, 0.0, dn)
            lf = jnp.where(j_lo, 0.0, lf)
            rt = jnp.where(j_hi, 0.0, rt)
        return ((up + dn) + lf) + rt

    pE = jnp.zeros((rows, wwp), f32)
    pO = jnp.zeros((rows, wwp), f32)
    for half in range(2 * iters):
        if half % 2 == 0:   # update even (the reference's red)
            up, dn = vsh(pO)
            lf = jnp.where(a0, rsh(pO), pO)
            rt = jnp.where(a0, pO, lsh(pO))
            nb = nbr(up, dn, lf, rt, mE if member is not None else None)
            p_new = one_m_w * pE + wgt * (neg_invE * (dE - nb))
            pE = jnp.where(in_domE, p_new, 0.0)
        else:
            up, dn = vsh(pE)
            lf = jnp.where(a0, pE, rsh(pE))
            rt = jnp.where(a0, lsh(pE), pE)
            nb = nbr(up, dn, lf, rt, mO if member is not None else None)
            p_new = one_m_w * pO + wgt * (neg_invO * (dO - nb))
            pO = jnp.where(in_domO, p_new, 0.0)

    return interleave_parity(pE, pO, base, ww)
