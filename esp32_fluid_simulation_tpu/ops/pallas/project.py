"""Fully-fused pressure projection: divergence -> red-black SOR ->
gradient-subtract in ONE Pallas kernel (SURVEY.md §7.4b).

The projection pipeline (``.ino:271-278``) touches three full fields per
pass when composed from separate ops; fused with overlapped tiling it reads
the velocity window once and writes the projected velocity (plus pressure,
for observability) once.  Halo bookkeeping: producing a correct projected
tile needs pressure valid one ring out (gradient stencil), pressure valid at
ring r needs ``2*iters`` more rings (one per half-sweep), and divergence at
the outermost pressure ring needs one more ring of velocity — so the
velocity halo is ``2*iters + 2`` cells, rounded up to hardware tiles.

Boundary conditions are evaluated from global coordinates inside the kernel,
exactly as the separate ops do: reflected-ghost velocity for divergence
(``finitediff.cpp:17-20``), zero-ghost neighbor sums + variable ``a_ii``
Neumann diagonal for SOR (``poisson.cpp:63-90``), edge-clamped pressure for
the gradient (``finitediff.cpp:51-54``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rb_common import packed_rb_solve_full
from .tiling import pick_tile
from .window import window_ops, issue


def _project_kernel(goff_ref, *args, iters, omega, dx, tile_h, tile_w,
                    pr, pc, h, w, bh, bw, member=None, n_imp=0,
                    clamped=False):
    if n_imp:
        (ipos_ref, ivel_ref, iact_ref, v_hbm, vout_ref, pout_ref,
         vwin_vmem, sem) = args
    else:
        v_hbm, vout_ref, pout_ref, vwin_vmem, sem = args
    r = pl.program_id(0)
    c = pl.program_id(1)
    row0 = r * tile_h
    col0 = c * tile_w
    wh = tile_h + 2 * pr
    ww = tile_w + 2 * pc

    # Double-buffered window DMA across grid steps: tile i+1's window
    # streams in during tile i's solve (scratch persists across the
    # sequential grid walk).  At 8192^2 the un-overlapped window fetch is
    # ~24 us/program against ~15 us of solve — the whole 12.4 -> ~8 ms
    # gap vs area-scaled 4096^2 (measured round 4, tools/ probes).
    nc_ = pl.num_programs(1)
    idx = r * nc_ + c
    slot = jax.lax.rem(idx, 2)

    if clamped:
        # Clamped-patchwork mode: the window streams straight from the
        # UNPADDED field as 9 unconditional pieces whose SOURCE starts are
        # clamped into the field (ops/pallas/window.py).  Pieces land at
        # their correct dst offsets, so the owned tile stays at the static
        # (pr, pc) origin; out-of-domain window cells hold misplaced-but-
        # finite field data that the ``in_dom`` mask below zeroes before
        # the solve — the same contract the padded layout met with its
        # zero ring.  The vpad HBM copy disappears.
        def win_ops(i, s):
            return window_ops(v_hbm, vwin_vmem.at[s], sem.at[s], i,
                              nc=nc_, npr=pl.num_programs(0), th=tile_h,
                              tw=tile_w, pr=pr, lpad=pc,
                              rg=16 if vwin_vmem.dtype.itemsize == 2 else 8,
                              clamp=True)

        def start_win(i, s):
            issue(win_ops(i, s), "start")

        def wait_win(i, s):
            issue(win_ops(i, s), "wait")
    else:
        def win_dma(i, s):
            r0 = (i // nc_) * tile_h
            c0 = jax.lax.rem(i, nc_) * tile_w
            return pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(r0, wh), pl.ds(c0, ww)],
                vwin_vmem.at[s], sem.at[s])

        def start_win(i, s):
            win_dma(i, s).start()

        def wait_win(i, s):
            win_dma(i, s).wait()

    @pl.when(idx == 0)
    def _():
        start_win(idx, slot)

    @pl.when(idx + 1 < pl.num_programs(0) * nc_)
    def _():
        start_win(idx + 1, 1 - slot)

    f32 = jnp.float32
    # global coordinates: block-local window position + the (traced) block
    # offset — zero on a single chip, the shard origin under shard_map
    gi = (jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 0) + (row0 - pr)
          + goff_ref[0, 0])
    gj = (jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 1) + (col0 - pc)
          + goff_ref[0, 1])
    in_dom = (gi >= 0) & (gi < h) & (gj >= 0) & (gj < w)
    if (bh, bw) != (h, w):
        # Block mode: window cells past the block's exchanged halo are
        # zero-padding, not real field data — keep them out of the solve.
        # (They are beyond the trapezoidal validity horizon, so the owned
        # tile's result is unaffected either way; masking keeps the halo
        # accounting explicit.)  hm = valid ghost width per side.
        li = gi - goff_ref[0, 0]
        lj = gj - goff_ref[0, 1]
        hm = 2 * iters + 2
        in_dom &= ((li >= -hm) & (li < bh + hm)
                   & (lj >= -hm) & (lj < bw + hm))
    if member is None:
        at_i_lo = gi == 0
        at_i_hi = gi == h - 1
        at_j_lo = gj == 0
        at_j_hi = gj == w - 1
    else:
        # tiled-domain mode: walls live at every member-tile boundary
        mh, mw = member
        gim = gi % mh
        gjm = gj % mw
        at_i_lo = gim == 0
        at_i_hi = gim == mh - 1
        at_j_lo = gjm == 0
        at_j_hi = gjm == mw - 1

    wait_win(idx, slot)
    vx = jnp.where(in_dom, vwin_vmem[slot, 0].astype(f32), 0.0)
    vy = jnp.where(in_dom, vwin_vmem[slot, 1].astype(f32), 0.0)

    # fused drag-queue drain (.ino:264-269): overwrite velocity at the
    # impulse cells IN-WINDOW, before divergence — saves the standalone
    # scatter's full velocity HBM round trip.  Sequential slot order =
    # last active slot wins, exactly like apply_impulses; global-coord
    # compare applies each impulse wherever its cell appears in any
    # tile's window (interior or halo), so neighboring tiles see it too.
    for n in range(n_imp):
        hit = ((iact_ref[n, 0] != 0) & (gi == ipos_ref[n, 0])
               & (gj == ipos_ref[n, 1]) & in_dom)
        vx = jnp.where(hit, ivel_ref[n, 0], vx)
        vy = jnp.where(hit, ivel_ref[n, 1], vy)

    zrow = jnp.zeros((1, ww), f32)
    zcol = jnp.zeros((wh, 1), f32)

    def up(x):
        return jnp.concatenate([zrow, x[:-1, :]], axis=0)   # x[i-1, j]

    def dn(x):
        return jnp.concatenate([x[1:, :], zrow], axis=0)    # x[i+1, j]

    def lf(x):
        return jnp.concatenate([zcol, x[:, :-1]], axis=1)   # x[i, j-1]

    def rt(x):
        return jnp.concatenate([x[:, 1:], zcol], axis=1)    # x[i, j+1]

    inv2dx = f32(1.0 / (2.0 * dx))
    # divergence with reflected ghosts at global walls (finitediff.cpp:9-31):
    # the out-of-domain neighbor contributes -v of the center cell
    t_up = jnp.where(at_i_lo, -vx, up(vx))     # value at i-1 (ghost=-center)
    t_dn = jnp.where(at_i_hi, -vx, dn(vx))     # value at i+1
    t_lf = jnp.where(at_j_lo, -vy, lf(vy))
    t_rt = jnp.where(at_j_hi, -vy, rt(vy))
    # safe-kernel accumulation order: (-left + right) + (-down + up)
    div = ((-t_up + t_dn) + (-t_lf + t_rt)) * inv2dx
    dxd = jnp.where(in_dom, f32(dx) * div, 0.0)

    # all 2*iters half-sweeps on dense packed checkerboard arrays (half the
    # lanes of the masked full-width loop; bit-identical results)
    gi0 = (row0 - pr) + goff_ref[0, 0]
    gj0 = (col0 - pc) + goff_ref[0, 1]
    p = packed_rb_solve_full(dxd, gi0, gj0, h, w, in_dom, iters, omega,
                             member=member)

    # gradient subtract with Neumann edge clamp (finitediff.cpp:41-73)
    p_im1 = jnp.where(at_i_lo, p, up(p))
    p_ip1 = jnp.where(at_i_hi, p, dn(p))
    p_jm1 = jnp.where(at_j_lo, p, lf(p))
    p_jp1 = jnp.where(at_j_hi, p, rt(p))
    vx_out = vx - (p_ip1 - p_im1) * inv2dx
    vy_out = vy - (p_jp1 - p_jm1) * inv2dx

    sl = (slice(pr, pr + tile_h), slice(pc, pc + tile_w))
    vout_ref[0] = vx_out[sl].astype(vout_ref.dtype)
    vout_ref[1] = vy_out[sl].astype(vout_ref.dtype)
    pout_ref[:, :] = p[sl].astype(pout_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("dx", "iters", "omega", "tile_h",
                                    "tile_w", "global_shape", "halo",
                                    "member", "clamped"))
def project_fused_pallas(vel: jax.Array, dx: float = 1.0, iters: int = 10,
                         omega: float = 1.96, tile_h: int | None = None,
                         tile_w: int | None = None,
                         global_offset: jax.Array | None = None,
                         global_shape=None, halo: int = 0, member=None,
                         impulses=None, clamped: bool | None = None):
    """(projected velocity, pressure) — replaces divergence + sor_solve +
    subtract_gradient for 2D grids.

    Block mode (the ``shard_map`` path): when ``global_offset`` — a traced
    ``(2,)`` int32 array — is given, ``vel`` is one shard's local block
    carrying ``halo >= 2*iters + 2`` exchanged ghost cells per side and
    ``global_shape`` is the full-domain extent for the boundary-condition
    masks.  One halo exchange then replaces the composed path's
    ``2*iters + 3`` per-stencil collectives.

    ``impulses``: an optional ``state.Impulses`` batch drained INSIDE the
    kernel (before divergence, ``.ino:258-269`` order) — the fused
    replacement for ``apply_impulses`` + this kernel, saving the scatter's
    full velocity HBM round trip.  Values are pre-rounded to ``vel.dtype``
    so the result is bit-identical to the composed path.
    """
    need = 2 * iters + 2
    block_mode = global_offset is not None
    if block_mode and halo < need:
        raise ValueError(f"block mode needs halo >= 2*iters+2 ghost cells "
                         f"({halo} < {need})")
    if block_mode:
        bh, bw = vel.shape[1] - 2 * halo, vel.shape[2] - 2 * halo
        h, w = global_shape
    else:
        _, bh, bw = vel.shape
        h, w = bh, bw
        halo = 0
    # sublane halo rounded to the dtype's sublane tile (8 rows for 4-byte,
    # 16 for 2-byte) so clamped-patchwork DMA starts stay provably aligned
    rg = 16 if vel.dtype.itemsize == 2 else 8
    pr = pl.cdiv(need, rg) * rg
    pc = pl.cdiv(need, 128) * 128
    if halo > min(pr, pc):
        raise ValueError(f"halo={halo} exceeds the aligned kernel window "
                         f"(pr={pr}, pc={pc})")
    # auto tiles minimize n_tiles * window_area (see ops/pallas/tiling.py);
    # th capped at 128: the 2-channel window + packed-RB arrays at th=256
    # exceed the 16M scoped-vmem limit (measured OOM at 1024^2)
    th = (pick_tile(bh, pr, 8, 128) if tile_h is None
          else min(tile_h, pl.cdiv(bh, 8) * 8))
    tw = (pick_tile(bw, pc, 128, 1024) if tile_w is None
          else min(tile_w, pl.cdiv(bw, 128) * 128))
    hp = pl.cdiv(bh, th) * th
    wp = pl.cdiv(bw, tw) * tw
    goff = (jnp.zeros((1, 2), jnp.int32) if global_offset is None
            else global_offset.astype(jnp.int32).reshape(1, 2))

    # Clamped-patchwork mode: read windows straight from the UNPADDED field
    # as 9 unconditional clamped-source DMA pieces (ops/pallas/window.py) —
    # the vpad HBM copy disappears (silicon A/B at 4096^2 f32: 3.66 ->
    # 1.85 ms, bit-exact, tools/proj_clamp_probe.py); the kernel's in_dom
    # mask already zeroes whatever lands in out-of-domain window cells.
    # Needs exact tiling and no embedded block halo.
    clamped_ok = not block_mode and hp == bh and wp == bw and th % rg == 0
    if clamped is None:
        clamped = clamped_ok
    elif clamped and not clamped_ok:
        raise ValueError("clamped=True needs exact tiling, no block halo, "
                         "and rg-aligned tile_h")
    if clamped:
        vpad = vel
    else:
        vpad = jnp.pad(vel, ((0, 0), (pr - halo, pr - halo + hp - bh),
                             (pc - halo, pc - halo + wp - bw)))

    n_imp = 0
    imp_args = []
    imp_specs = []
    if impulses is not None:
        n_imp = impulses.pos.shape[0]
        # clamp exactly like apply_impulses; round values through vel.dtype
        # so fused == scatter-then-project bit-exactly
        ipos = jnp.stack([jnp.clip(impulses.pos[:, 0], 0, h - 1),
                          jnp.clip(impulses.pos[:, 1], 0, w - 1)], axis=1)
        ivel = (impulses.velocity.astype(vel.dtype)
                .astype(jnp.float32).reshape(n_imp, 2))
        iact = impulses.active.astype(jnp.int32).reshape(n_imp, 1)
        imp_args = [ipos.astype(jnp.int32), ivel, iact]
        imp_specs = [
            pl.BlockSpec((n_imp, 2), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_imp, 2), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_imp, 1), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ]

    kernel = functools.partial(
        _project_kernel, iters=iters, omega=omega, dx=dx,
        tile_h=th, tile_w=tw, pr=pr, pc=pc, h=h, w=w, bh=bh, bw=bw,
        member=member, n_imp=n_imp, clamped=clamped)

    vout, pout = pl.pallas_call(
        kernel,
        grid=(hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((1, 2), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + imp_specs + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((2, th, tw), lambda r, c: (0, r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda r, c: (r, c),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, hp, wp), vel.dtype),
            jax.ShapeDtypeStruct((hp, wp), vel.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, th + 2 * pr, tw + 2 * pc), vpad.dtype),
            (pltpu.SemaphoreType.DMA((2, 3, 3)) if clamped
             else pltpu.SemaphoreType.DMA((2,))),
        ],
    )(goff, *imp_args, vpad)
    return vout[:, :bh, :bw], pout[:bh, :bw]
