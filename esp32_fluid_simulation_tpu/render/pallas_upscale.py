"""Fused bilinear-upscale + RGB565-pack Pallas kernel.

The jnp render path (``render/upscale.py``) materializes the row-lerped
intermediate and the float RGB image in HBM before packing; at 4x upscale
that is ~10x the traffic of the 2-byte output.  This kernel reads each
source tile once into VMEM, expands and packs entirely on-chip, and writes
only the final uint16 pixels — the TPU rendition of ``draw_routine``'s
tile-by-tile incremental lerp + pack (``.ino:116-176``), where the LCD's
DMA double-buffering becomes the Pallas input/output pipeline.

Row expansion is a broadcasted lerp over the ``s`` row phases (sublane-dim
reshape); column expansion indexes the row-expanded tile with a *static*
``take_along_axis`` pattern (``j_in = j_out // s``) that lowers to the
hardware lane gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas.gather_utils import lane_gather


def _render_kernel(c_hbm, out_ref, cwin_vmem, sem, *, s, ti_h, ti_w,
                   pad_r, pad_c, bswap):
    r = pl.program_id(0)
    c = pl.program_id(1)
    row0 = r * ti_h
    col0 = c * ti_w

    dma = pltpu.make_async_copy(
        c_hbm.at[:, pl.ds(row0, ti_h + pad_r), pl.ds(col0, ti_w + pad_c)],
        cwin_vmem, sem)
    dma.start()

    f32 = jnp.float32
    tho = ti_h * s
    two = ti_w * s
    # row phase fraction per output row: (r % s) / s.  Built at full width:
    # (tho, 1)-shaped iota columns trip a libtpu layout CHECK
    # ("limits[i] <= dim(i)") in this toolchain.
    wa = ((jax.lax.broadcasted_iota(jnp.int32, (tho, ti_w + pad_c), 0) % s)
          .astype(f32) / f32(s))
    j_out = jax.lax.broadcasted_iota(jnp.int32, (tho, two), 1)
    j_in = j_out // s
    fb = (j_out % s).astype(f32) / f32(s)
    # output panel po reads source cols [128*po/s, (128*(po+1))/s] — at most
    # two source panels (gather_utils panel decomposition)
    q_base = lambda po: (po * 128 // s) // 128  # noqa: E731

    dma.wait()

    def expand(ch):
        cw = cwin_vmem[ch].astype(f32)           # (ti_h+pad_r, ti_w+pad_c)
        r0 = jnp.repeat(cw[:ti_h, :], s, axis=0)         # node rows i
        r1 = jnp.repeat(cw[1:ti_h + 1, :], s, axis=0)    # node rows i+1
        rows = r0 * (1.0 - wa) + r1 * wa                 # (tho, ti_w+pad_c)
        # tpu.dynamic_gather with COMPILE-TIME-CONSTANT indices crashes this
        # Mosaic backend (libtpu CHECK in array.h); tying the index array to
        # runtime data defeats the constant-folded lowering path.
        zero = (rows[:, 0:1] * 0.0).astype(jnp.int32)
        ji = j_in + zero
        g0 = lane_gather(rows, ji, q_base=q_base, band=2)
        g1 = lane_gather(rows, ji + 1, q_base=q_base, band=2)
        return g0 * (1.0 - fb) + g1 * fb

    def chan_bits(ch, bits):
        q = jnp.floor(expand(ch) * f32(1 << bits)).astype(jnp.int32)
        return jnp.clip(q, 0, (1 << bits) - 1)

    word = ((chan_bits(0, 5) << 11) | (chan_bits(1, 6) << 5)
            | chan_bits(2, 5))
    if bswap:
        word = ((word << 8) | (word >> 8)) & 0xFFFF
    out_ref[:, :] = word.astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("s", "bswap", "tile_h",
                                             "tile_w"))
def render_rgb565_pallas(color: jax.Array, s: int = 4, bswap: bool = True,
                         tile_h: int = 64, tile_w: int = 256) -> jax.Array:
    """Fused render: ``[3, H, W] -> [(H-1)*s, (W-1)*s] uint16``."""
    _, h, w = color.shape
    ho, wo = (h - 1) * s, (w - 1) * s
    ti_h = min(tile_h, pl.cdiv(h - 1, 8) * 8)
    ti_w = min(tile_w, pl.cdiv(w - 1, 128) * 128)
    hp = pl.cdiv(h - 1, ti_h) * ti_h
    wp = pl.cdiv(w - 1, ti_w) * ti_w
    pad_r, pad_c = 8, 128  # aligned DMA windows incl. the +1 lerp endpoint

    cpad = jnp.pad(color, ((0, 0), (0, hp + pad_r - h), (0, wp + pad_c - w)),
                   mode="edge")

    kernel = functools.partial(_render_kernel, s=s, ti_h=ti_h, ti_w=ti_w,
                               pad_r=pad_r, pad_c=pad_c, bswap=bswap)

    out = pl.pallas_call(
        kernel,
        grid=(hp // ti_h, wp // ti_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ti_h * s, ti_w * s), lambda r, c: (r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp * s, wp * s), jnp.uint16),
        scratch_shapes=[
            pltpu.VMEM((3, ti_h + pad_r, ti_w + pad_c), cpad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(cpad)
    return out[:ho, :wo]
