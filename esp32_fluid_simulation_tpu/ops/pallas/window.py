"""Clamped-window DMA: load a stencil halo window STRAIGHT from an
UNPADDED HBM field as a 3x3 patchwork of conditional copies.

Why: the window kernels (sloop advect, fused projection) read overlapping
``[r0-pr, r0+th+pr) x [c0-lpad, c0+tw+lpad)`` windows per grid program.
Making those window DMAs unconditionally in-bounds used to require
zero-padding the whole field first (``fpad``/``vpad``) — a pure HBM copy
worth ~0.9 ms/step at 4096^2 (docs/PERFORMANCE.md "Roofline position").
This module loads the window from the raw field instead: the always-valid
core plus up to 8 edge strips, each strip loaded only when the program is
not on the corresponding grid edge (``pl.when``).

Mosaic rules this shape must obey (probed on v5e silicon,
``tools/nopad_dma_probe*.py`` — each rule is a hard compile error):

* DMA **lane** slices must be 128-aligned AND a multiple of 128 wide on
  both the HBM source and the VMEM destination.  A 64-lane halo therefore
  cannot be DMA'd directly; callers with a 64-lane window origin (the
  advect panel band) load a 128-lane-halo *wide* window and restore their
  origin with one cheap in-VMEM ``pltpu.roll`` per channel.
* DMA **sublane** (row) starts must be *provably* divisible by the dtype's
  sublane tile (8 for 4-byte, 16 for 2-byte types).  Affine expressions
  like ``r*th - pr`` with divisible coefficients do NOT prove on their
  own; every start here is factored as ``pl.multiple_of(k * g, g)``.

Correctness contract: strips skipped at the domain edge leave their window
region UNWRITTEN (stale scratch / uninitialized VMEM).  Callers must either
(a) select the window through an in-domain mask (``jnp.where(in_dom, ...)``
— the projection kernel), or (b) zero the skipped strips before reading
(the advect kernel, whose multiply-accumulate needs finite garbage).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: lane halo width of the wide window — the smallest DMA-legal lane unit
LANE_PAD = 128


def window_ops(field, dst, sem, i, *, nc, npr, th, tw, pr, lpad, rg=8,
               clamp=True):
    """Build the 3x3 patchwork loading window ``i``.

    field: HBM ref ``[C, H, W]`` (unpadded; H = npr*th, W = nc*tw).
    dst:   VMEM ref ``[C, th + 2*pr, tw + 2*lpad]`` (a ``.at[slot]`` view
           of a double-buffer scratch works).
    sem:   DMA semaphore ref of shape ``(3, 3)`` (a ``.at[slot]`` view of
           a ``(2, 3, 3)`` scratch works).
    i:     traced linear program index ``r*nc + c`` — may be this
           program's or a prefetch target's.
    rg:    sublane tile of ``field.dtype`` (8 for 4-byte, 16 for 2-byte).

    clamp=True (default): every piece is issued UNCONDITIONALLY with its
    source start clamped into the field — out-of-domain pieces load
    misplaced-but-finite field data that :func:`zero_skipped_strips` (or an
    in-domain mask) must overwrite, exactly like the skipped-strip contract.
    The 2026-08-19 probes found the ``pl.when``-guarded variant a perf
    wash: the conditional issue pattern defeats Mosaic's DMA pipelining.
    Unconditional clamped pieces pipeline like plain copies.

    clamp=False: the original conditional patchwork (edge pieces skipped
    via ``pl.when``), kept for A/B.

    Returns ``[(cond_or_None, async_copy), ...]``; pass to :func:`issue`
    with ``"start"`` and later ``"wait"``.  Both calls must be built from
    the SAME ``i`` so the conditions match.
    """
    if th % rg or pr % rg:
        raise ValueError(f"th={th}/pr={pr} must be multiples of rg={rg}")
    if tw % 128 or lpad % 128:
        raise ValueError(f"tw={tw}/lpad={lpad} must be multiples of 128")
    rr = i // nc
    cc = jax.lax.rem(i, nc)
    # explicit g-factoring: Mosaic only accepts provably-divisible starts
    hg = npr * (th // rg)      # field height in sublane tiles
    wl = nc * (tw // 128)      # field width in lane tiles

    def row(k, nrow):
        if clamp:
            k = jnp.clip(k, 0, hg - nrow // rg)
        return pl.multiple_of(k * rg, rg)

    def lane(k, nlane):
        if clamp:
            k = jnp.clip(k, 0, wl - nlane // 128)
        return pl.multiple_of(k * 128, 128)

    thg, prg = th // rg, pr // rg
    twl, lpl = tw // 128, lpad // 128
    rbands = [  # (dst row offset, src row start, rows, condition)
        (0, row(rr * thg - prg, pr), pr, rr > 0),
        (pr, row(rr * thg, th), th, None),
        (pr + th, row(rr * thg + thg, pr), pr, rr < npr - 1),
    ]
    lbands = [  # (dst lane offset, src lane start, lanes, condition)
        (0, lane(cc * twl - lpl, lpad), lpad, cc > 0),
        (lpad, lane(cc * twl, tw), tw, None),
        (lpad + tw, lane(cc * twl + twl, lpad), lpad, cc < nc - 1),
    ]
    ops = []
    for bi, (dr, fr, nrow, rcond) in enumerate(rbands):
        for bj, (dl, fl, nlane, ccond) in enumerate(lbands):
            cond = None
            if not clamp:
                for c_ in (rcond, ccond):
                    if c_ is not None:
                        cond = (c_ if cond is None
                                else jnp.logical_and(cond, c_))
            cp = pltpu.make_async_copy(
                field.at[:, pl.ds(fr, nrow), pl.ds(fl, nlane)],
                dst.at[:, pl.ds(dr, nrow), pl.ds(dl, nlane)],
                sem.at[bi, bj])
            ops.append((cond, cp))
    return ops


def issue(ops, what):
    """Start or wait every patch: ``what`` is ``"start"`` or ``"wait"``."""
    for cond, cp in ops:
        fn = getattr(cp, what)
        if cond is None:
            fn()
        else:
            pl.when(cond)(fn)


def zero_skipped_strips(win_at_slot, r, c, npr, nc, *, n_ch, th, tw, pr,
                        lpad, dtype):
    """Zero the window strips the patchwork skipped on edge programs, so a
    caller whose arithmetic needs finite garbage never reads uninitialized
    VMEM.  ``win_at_slot``: the ``(C, th+2pr, tw+2lpad)`` ref view.  Writes
    go through per-channel 2D refs (3D-ref partial slices crash the Mosaic
    lowering on v5e — see ops/pallas/advect.py module doc)."""
    wide = tw + 2 * lpad
    wh = th + 2 * pr

    @pl.when(r == 0)
    def _():
        for ch in range(n_ch):
            win_at_slot.at[ch][0:pr, :] = jnp.zeros((pr, wide), dtype)

    @pl.when(r == npr - 1)
    def _():
        for ch in range(n_ch):
            win_at_slot.at[ch][pr + th:, :] = jnp.zeros((pr, wide), dtype)

    @pl.when(c == 0)
    def _():
        for ch in range(n_ch):
            win_at_slot.at[ch][:, 0:lpad] = jnp.zeros((wh, lpad), dtype)

    @pl.when(c == nc - 1)
    def _():
        for ch in range(n_ch):
            win_at_slot.at[ch][:, lpad + tw:] = jnp.zeros((wh, lpad), dtype)
