"""Fused red-black SOR Poisson solve as a single Pallas kernel.

The jnp solver (``ops.poisson.sor_solve``) round-trips the pressure array
through HBM twice per half-sweep: 10 reference iterations = 20 full-grid
read+writes, ~40x the data movement the math needs.  This kernel runs the
ENTIRE solve in one pass using overlapped (trapezoidal) tiling:

* pressure starts at zero every solve (``poisson.cpp:117-119``), so the only
  input is the divergence window;
* each program DMAs its tile plus a ``2*iters``-cell halo of ``d``, keeps the
  pressure workspace in VMEM, and runs all ``2*iters`` checkerboard
  half-sweeps locally.  A half-sweep invalidates one ring of the halo (its
  outer cells see zeros instead of the neighbor tile's values), so after
  ``2*iters`` half-sweeps the interior tile is still *exactly* the global
  result — redundant compute on the halo ring buys zero HBM traffic between
  sweeps;
* cells outside the global domain are forced to zero each half-sweep, which
  reproduces the reference's zero-ghost neighbor sums at walls, and the
  variable Neumann diagonal ``a_ii`` (``poisson.cpp:63-90``) is rebuilt from
  global coordinates (edge/corner selects) inside the kernel;
* the red/black masks, parity, and update are the same math as
  ``ops.poisson.sor_sweep`` — parity-tested against it.

Halos are rounded to hardware tiles (8 sublanes / 128 lanes), so the
redundant-compute overhead at tile 256x1024 with iters=10 is ~(280/256 *
1280/1024) = 1.37x of a sweep's FLOPs — paid once, versus 20 HBM round
trips saved.
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


def _sor_kernel(goff_ref, d_hbm, out_ref, dwin_vmem, sem,
                *, iters, omega, dx, tile_h, tile_w, pr, pc, h, w, bh, bw,
                member=None):
    r = pl.program_id(0)
    c = pl.program_id(1)
    row0 = r * tile_h
    col0 = c * tile_w
    wh = tile_h + 2 * pr
    ww = tile_w + 2 * pc

    dma = pltpu.make_async_copy(
        d_hbm.at[pl.ds(row0, wh), pl.ds(col0, ww)], dwin_vmem, sem)
    dma.start()

    f32 = jnp.float32
    # global coords of the window (window (0,0) is global (row0-pr, col0-pc)
    # plus the traced block offset — zero on a single chip)
    gi = (jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 0)
          + (row0 - pr) + goff_ref[0, 0])
    gj = (jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 1)
          + (col0 - pc) + goff_ref[0, 1])
    in_dom = ((gi >= 0) & (gi < h) & (gj >= 0) & (gj < w))
    if (bh, bw) != (h, w):
        # block mode: window cells past the exchanged halo are zero-padding
        # beyond the trapezoidal validity horizon — keep them inert
        li = gi - goff_ref[0, 0]
        lj = gj - goff_ref[0, 1]
        hm = 2 * iters
        in_dom &= ((li >= -hm) & (li < bh + hm)
                   & (lj >= -hm) & (lj < bw + hm))
    dma.wait()
    dxd = dwin_vmem[:].astype(f32) * f32(dx)
    dxd = jnp.where(in_dom, dxd, 0.0)

    # all 2*iters half-sweeps on dense packed checkerboard arrays (half the
    # lanes of the masked full-width loop; bit-identical results); the
    # variable Neumann diagonal (poisson.cpp:67-89) is built inside
    gi0 = (row0 - pr) + goff_ref[0, 0]
    gj0 = (col0 - pc) + goff_ref[0, 1]
    p = packed_rb_solve_full(dxd, gi0, gj0, h, w, in_dom, iters, omega,
                             member=member)

    out_ref[:, :] = p[pr:pr + tile_h, pc:pc + tile_w].astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("dx", "iters", "omega", "tile_h",
                                    "tile_w", "global_shape", "halo",
                                    "member"))
def sor_solve_pallas(d: jax.Array, dx: float = 1.0, iters: int = 10,
                     omega: float = 1.96, tile_h: int | None = None,
                     tile_w: int | None = None,
                     global_offset: jax.Array | None = None,
                     global_shape=None, halo: int = 0,
                     member=None) -> jax.Array:
    """Drop-in replacement for ``ops.poisson.sor_solve`` on large 2D grids.

    Block mode (the ``shard_map`` path): when ``global_offset`` — a traced
    ``(2,)`` int32 array — is given, ``d`` is one shard's local divergence
    block carrying ``halo >= 2*iters`` exchanged ghost cells per side and
    ``global_shape`` is the full-domain extent for the BC masks.
    """
    need = 2 * iters
    block_mode = global_offset is not None
    if block_mode and halo < need:
        raise ValueError(f"block mode needs halo >= 2*iters ghost cells "
                         f"({halo} < {need})")
    if block_mode:
        bh, bw = d.shape[0] - 2 * halo, d.shape[1] - 2 * halo
        h, w = global_shape
    else:
        bh, bw = d.shape
        h, w = bh, bw
        halo = 0
    pr = pl.cdiv(need, 8) * 8
    pc = pl.cdiv(need, 128) * 128
    if halo > min(pr, pc):
        raise ValueError(f"halo={halo} exceeds the aligned kernel window "
                         f"(pr={pr}, pc={pc})")
    # auto tiles minimize n_tiles * window_area (odd shapes pay heavy
    # round-up padding at fixed 256x1024 — see ops/pallas/tiling.py)
    th = (pick_tile(bh, pr, 8, 256) if tile_h is None
          else min(tile_h, pl.cdiv(bh, 8) * 8))
    tw = (pick_tile(bw, pc, 128, 1024) if tile_w is None
          else min(tile_w, pl.cdiv(bw, 128) * 128))
    hp = pl.cdiv(bh, th) * th
    wp = pl.cdiv(bw, tw) * tw
    goff = (jnp.zeros((1, 2), jnp.int32) if global_offset is None
            else global_offset.astype(jnp.int32).reshape(1, 2))

    dpad = jnp.pad(d, ((pr - halo, pr - halo + hp - bh),
                       (pc - halo, pc - halo + wp - bw)))

    kernel = functools.partial(
        _sor_kernel, iters=iters, omega=omega, dx=dx,
        tile_h=th, tile_w=tw, pr=pr, pc=pc, h=h, w=w, bh=bh, bw=bw,
        member=member)

    out = pl.pallas_call(
        kernel,
        grid=(hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((1, 2), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((th, tw), lambda r, c: (r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), d.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * pr, tw + 2 * pc), dpad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(goff, dpad)
    return out[:bh, :bw]
