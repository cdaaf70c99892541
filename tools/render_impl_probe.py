"""Probe alternative inner formulations of the upscale+pack render kernel.

The tile sweep (tools/render_probe.py) shows the round-3 kernel is
compute/relayout-bound: best 7.1 ms for 4096^2 -> 16384^2 where the store
roofline is ~0.9 ms and the lerp/quantize/pack VPU work prices at ~1.7 ms.
The suspects are the in-kernel transposes (f32 forward + u16 back).

Variants, all bit-exact targets vs the jnp path:

  t      : current transpose pipeline (baseline)
  lrep   : lane-axis jnp.repeat for the column stretch (no transpose)
  u32    : phase planes packed pairwise into u32 lanes
           (p0|p1<<16, p2|p3<<16), pair-interleaved via lane-repeat+select,
           stored as u32 (bitcast to u16 outside the kernel)
  floor  : compute planes, store WITHOUT interleave (wrong image; lower
           bound for compute+store)

  python tools/render_impl_probe.py
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esp32_fluid_simulation_tpu.render.pallas_upscale import (  # noqa: E402
    PAD_C, PAD_R, _expand_rows, _fetch, _pack565, _padded, _quant,
    render_rgb565_pallas)
from esp32_fluid_simulation_tpu.utils.profiling import chain_time  # noqa: E402


def _kernel_lrep(c_hbm, out_ref, cwin_vmem, sem, *, s, ti_h, ti_w, bswap):
    _fetch(c_hbm, cwin_vmem, sem, pl.program_id(0), pl.program_id(1),
           ti_h=ti_h, ti_w=ti_w)
    rows = _expand_rows(cwin_vmem, s=s, ti_h=ti_h, ti_w=ti_w)
    f32 = jnp.float32
    tho = ti_h * s
    wb = ((jax.lax.broadcasted_iota(jnp.int32, (tho, ti_w * s), 1) % s)
          .astype(f32) / f32(s))

    def chan_bits(ch, bits):
        rw = rows[ch]
        c0 = jnp.repeat(rw[:, :ti_w], s, axis=1)
        c1 = jnp.repeat(rw[:, 1:ti_w + 1], s, axis=1)
        return _quant(c0 * (1.0 - wb) + c1 * wb, bits)

    word = _pack565(chan_bits(0, 5), chan_bits(1, 6), chan_bits(2, 5), bswap)
    out_ref[:, :] = word.astype(jnp.uint16)


def _planes(rows, *, s, ti_w, bswap):
    f32 = jnp.float32
    planes = []
    for p in range(s):
        fb = f32(p) / f32(s)

        def chan_bits(ch, bits):
            rw = rows[ch]
            v = rw[:, :ti_w] * (1.0 - fb) + rw[:, 1:ti_w + 1] * fb
            return _quant(v, bits)

        planes.append(_pack565(chan_bits(0, 5), chan_bits(1, 6),
                               chan_bits(2, 5), bswap))
    return planes


def _kernel_u32(c_hbm, out_ref, cwin_vmem, sem, *, s, ti_h, ti_w, bswap):
    """out_ref: (ti_h*s, ti_w*s//2) uint32 — u16 pixel pairs."""
    assert s == 4
    _fetch(c_hbm, cwin_vmem, sem, pl.program_id(0), pl.program_id(1),
           ti_h=ti_h, ti_w=ti_w)
    rows = _expand_rows(cwin_vmem, s=s, ti_h=ti_h, ti_w=ti_w)
    p0, p1, p2, p3 = _planes(rows, s=s, ti_w=ti_w, bswap=bswap)
    u32 = jnp.uint32
    a = p0.astype(u32) | (p1.astype(u32) << 16)   # pixels (4k+0, 4k+1)
    b = p2.astype(u32) | (p3.astype(u32) << 16)   # pixels (4k+2, 4k+3)
    tho = ti_h * s
    half = ti_w * 2
    even = (jax.lax.broadcasted_iota(jnp.int32, (tho, half), 1) % 2) == 0
    out_ref[:, :] = jnp.where(even, jnp.repeat(a, 2, axis=1),
                              jnp.repeat(b, 2, axis=1))


def _kernel_floor(c_hbm, out_ref, cwin_vmem, sem, *, s, ti_h, ti_w, bswap):
    """Lower bound: all compute, NO interleave (image is wrong)."""
    assert s == 4
    _fetch(c_hbm, cwin_vmem, sem, pl.program_id(0), pl.program_id(1),
           ti_h=ti_h, ti_w=ti_w)
    rows = _expand_rows(cwin_vmem, s=s, ti_h=ti_h, ti_w=ti_w)
    p0, p1, p2, p3 = _planes(rows, s=s, ti_w=ti_w, bswap=bswap)
    u32 = jnp.uint32
    a = p0.astype(u32) | (p1.astype(u32) << 16)
    b = p2.astype(u32) | (p3.astype(u32) << 16)
    out_ref[:, :] = jnp.concatenate([a, b], axis=1)


@functools.partial(jax.jit, static_argnames=("variant", "tile_h", "tile_w"))
def render_variant(color, variant="u32", tile_h=64, tile_w=256):
    s, bswap = 4, True
    _, h, w = color.shape
    ho, wo = (h - 1) * s, (w - 1) * s
    ti_h, ti_w = tile_h, tile_w
    hp = pl.cdiv(h - 1, ti_h) * ti_h
    wp = pl.cdiv(w - 1, ti_w) * ti_w
    cpad = _padded(color, h, w, hp, wp)
    n_r, n_c = hp // ti_h, wp // ti_w
    kw = dict(s=s, ti_h=ti_h, ti_w=ti_w, bswap=bswap)
    scratch = [pltpu.VMEM((3, ti_h + PAD_R, ti_w + PAD_C), cpad.dtype),
               pltpu.SemaphoreType.DMA]
    if variant == "lrep":
        out = pl.pallas_call(
            functools.partial(_kernel_lrep, **kw),
            grid=(n_r, n_c),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((ti_h * s, ti_w * s), lambda r, c: (r, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp * s, wp * s), jnp.uint16),
            scratch_shapes=scratch,
        )(cpad)
        return out[:ho, :wo]
    kern = _kernel_u32 if variant == "u32" else _kernel_floor
    out = pl.pallas_call(
        functools.partial(kern, **kw),
        grid=(n_r, n_c),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ti_h * s, ti_w * s // 2),
                               lambda r, c: (r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp * s, wp * s // 2), jnp.uint32),
        scratch_shapes=scratch,
    )(cpad)
    u16 = jax.lax.bitcast_convert_type(out, jnp.uint16)  # (H, W/2, 2)
    return u16.reshape(hp * s, wp * s)[:ho, :wo]


def main():
    n = 4097
    key = jax.random.PRNGKey(0)
    color = jax.block_until_ready(
        jax.random.uniform(key, (3, n, n), jnp.float32))

    # correctness first, small size
    small = jax.random.uniform(jax.random.PRNGKey(1), (3, 257, 385),
                               jnp.float32)
    ref = np.asarray(render_rgb565_pallas(small, s=4, tile_h=64, tile_w=256,
                                          impl="transpose"))
    for v in ("lrep", "u32"):
        try:
            got = np.asarray(render_variant(small, variant=v))
            print(f"{v:6s} bit-exact:", bool(np.array_equal(ref, got)))
        except Exception as e:  # noqa: BLE001
            print(f"{v:6s} FAILED {type(e).__name__}: {str(e)[:100]}")

    for v in ("lrep", "u32", "floor"):
        for th, tw in ((64, 256), (64, 512), (128, 256), (32, 512)):
            def step(c, v=v, th=th, tw=tw):
                o = render_variant(c, variant=v, tile_h=th, tile_w=tw)
                return c + (o[0, 0] > jnp.uint16(0)).astype(jnp.float32)
            try:
                t = chain_time(step, color, n=6)
                print(f"{v:6s} th={th:3d} tw={tw:4d}  {t*1e3:7.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{v:6s} th={th:3d} tw={tw:4d}  FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
