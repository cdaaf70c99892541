"""Fused Pallas MIP render for the 3D smoke plume: max-over-depth + heat
colormap + RGB565 pack in ONE pass over the volume (VERDICT r4 next #8).

The composed jnp path materializes the f32 [H, W] projection and three RGB
planes between passes; here each program streams its [D, th, tw] column
block through VMEM and writes only the final uint16 tile — the volume is
read exactly once and nothing else touches HBM (same only-pixels-leave
design as ``render.pallas_upscale``).

Bit-exact vs ``render.smoke.render_smoke(mode="mip", axis=0,
fmt="rgb565")``'s jnp expressions: max is order-independent, and the
colormap/pack arithmetic is identical (see ``tests/test_render.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mip_kernel(d_ref, out_ref, *, vmax, bswap):
    f32 = jnp.float32
    x = d_ref[...].astype(f32)
    m = jnp.max(x, axis=0)
    t = m * f32(1.0 / vmax)
    r = jnp.clip(3.0 * t, 0.0, 1.0)
    g = jnp.clip(3.0 * t - 1.0, 0.0, 1.0)
    b = jnp.clip(3.0 * t - 2.0, 0.0, 1.0)

    def q(v, bits):
        return jnp.clip((v * f32(1 << bits)).astype(jnp.int32),
                        0, (1 << bits) - 1)

    word = (q(r, 5) << 11) | (q(g, 6) << 5) | q(b, 5)
    if bswap:
        word = ((word << 8) | (word >> 8)) & 0xFFFF
    out_ref[...] = word.astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("bswap", "vmax", "tile_h",
                                             "tile_w"))
def render_smoke_mip_pallas(density: jax.Array, bswap: bool = True,
                            vmax: float = 1.0, tile_h: int = 8,
                            tile_w: int = 512):
    """``[D, H, W]`` density -> uint16 ``[H, W]`` RGB565 MIP (axis 0)."""
    D, H, W = density.shape
    # the RGB565 output is always uint16 (and the default smoke density is
    # bf16): both pack (16, 128) native tiles, so the tile height must be
    # a 16-multiple — round UP (the old default th=8 handed Mosaic a
    # misaligned window for every 16-bit operand)
    rg = 16
    th = min(pl.cdiv(max(tile_h, rg), rg) * rg, pl.cdiv(H, rg) * rg)
    tw = min(tile_w, pl.cdiv(W, 128) * 128)
    hp = pl.cdiv(H, th) * th
    wp = pl.cdiv(W, tw) * tw
    dpad = density
    if (hp, wp) != (H, W):
        dpad = jnp.pad(density, ((0, 0), (0, hp - H), (0, wp - W)))
    out = pl.pallas_call(
        functools.partial(_mip_kernel, vmax=vmax, bswap=bswap),
        grid=(hp // th, wp // tw),
        in_specs=[pl.BlockSpec((D, th, tw), lambda r, c: (0, r, c),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((th, tw), lambda r, c: (r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint16),
    )(dpad)
    return out[:H, :W]
