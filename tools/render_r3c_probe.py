"""Round-3c render probe.

Variants (all at production point: bf16 input, 4096 nodes, s=4):

  base     : shipped transpose kernel (control)
  fma      : transpose kernel with a+w*(b-a) lerps (1 op/px less per stage;
             NOT bit-exact vs base — candidate requires moving the jnp path
             to the same formula)
  sq2      : s^2 planes with hoisted lane shifts (the 3b probe paid 16x
             lane-rotates per channel; here: s row-planes + s lane-rolled
             copies, then pure vreg math), u32 pair packing, and a
             where(even, repeat, repeat) lane interleave of the u32 pairs +
             sublane stack for row phases
  sq2floor : same compute, planes stored without interleave (image wrong;
             formulation floor)

Usage: python tools/render_r3c_probe.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esp32_fluid_simulation_tpu.render.pallas_upscale import (  # noqa: E402
    PAD_C, PAD_R, _fetch, _padded, render_rgb565_pallas)

CH_BITS = (5, 6, 5)


# ---------------------------------------------------------------- fma variant
def _expand_rows_fma(cwin_vmem, *, s, ti_h, ti_w):
    f32 = jnp.float32
    tho = ti_h * s
    wa = ((jax.lax.broadcasted_iota(jnp.int32, (tho, ti_w + 1), 0) % s)
          .astype(f32) / f32(s))
    rows = []
    for ch in range(3):
        cw = cwin_vmem[ch].astype(f32)[:, :ti_w + 1]
        cw = cw * f32(1 << CH_BITS[ch])
        r0 = cw[:ti_h, :]
        d = cw[1:ti_h + 1, :] - r0          # input-res delta
        r0e = jnp.repeat(r0, s, axis=0)
        de = jnp.repeat(d, s, axis=0)
        rows.append(r0e + de * wa)           # fma at output-row res
    return rows


def _kernel_fma(c_hbm, out_ref, cwin_vmem, sem, *, s, ti_h, ti_w, bswap):
    _fetch(c_hbm, cwin_vmem, sem, pl.program_id(0), pl.program_id(1),
           ti_h=ti_h, ti_w=ti_w)
    rows = _expand_rows_fma(cwin_vmem, s=s, ti_h=ti_h, ti_w=ti_w)
    f32 = jnp.float32
    tho = ti_h * s
    wb = ((jax.lax.broadcasted_iota(jnp.int32, (ti_w * s, tho), 0) % s)
          .astype(f32) / f32(s))

    def chan_bits(ch, bits):
        rt = rows[ch].T
        c0 = rt[:ti_w, :]
        d = rt[1:ti_w + 1, :] - c0
        c0e = jnp.repeat(c0, s, axis=0)
        de = jnp.repeat(d, s, axis=0)
        q = (c0e + de * wb).astype(jnp.int32)
        return jnp.clip(q, 0, (1 << bits) - 1)

    word = ((chan_bits(0, 5) << 11) | (chan_bits(1, 6) << 5)
            | chan_bits(2, 5))
    if bswap:
        word = ((word << 8) | (word >> 8)) & 0xFFFF
    out_ref[:, :] = word.astype(jnp.uint16).T


# ---------------------------------------------------------------- sq2 variant
def _kernel_sq2(c_hbm, out_ref, cwin_vmem, sem, *, s, ti_h, ti_w, bswap,
                interleave):
    _fetch(c_hbm, cwin_vmem, sem, pl.program_id(0), pl.program_id(1),
           ti_h=ti_h, ti_w=ti_w)
    f32 = jnp.float32
    u32 = jnp.uint32

    # Per channel: s row-phase planes R_p at input res (hoisted row slices),
    # plus their one-lane-left-rolled copies Rs_p (shift commutes with the
    # row lerp, so roll AFTER lerping: s rolls per channel, not s^2).
    ch_planes = []  # [ch][p] -> (R_p, Rs_p), each (ti_h, ti_w + 128-pad)
    for ch in range(3):
        cw = cwin_vmem[ch].astype(f32)
        cw = cw * f32(1 << CH_BITS[ch])
        r0 = cw[:ti_h, :]
        r1 = cw[1:ti_h + 1, :]
        d = r1 - r0
        planes = []
        for p in range(s):
            a = f32(p) / f32(s)
            rp = r0 if p == 0 else r0 + d * a
            # left-roll by 1 == right-roll by width-1 (roll wants shift >= 0)
            rs = pltpu.roll(rp, rp.shape[1] - 1, 1)
            planes.append((rp[:, :ti_w], rs[:, :ti_w]))
        ch_planes.append(planes)

    # W[p][q] packed u16 planes at input res
    pairs = []
    for p in range(s):
        planes_q = []
        for q in range(s):
            b = f32(q) / f32(s)

            def bits(ch, nbits):
                rp, rs = ch_planes[ch][p]
                v = rp if q == 0 else rp + (rs - rp) * b
                return jnp.clip(v.astype(jnp.int32), 0, (1 << nbits) - 1)

            word = (bits(0, 5) << 11) | (bits(1, 6) << 5) | bits(2, 5)
            if bswap:
                word = ((word << 8) | (word >> 8)) & 0xFFFF
            planes_q.append(word)
        q01 = planes_q[0].astype(u32) | (planes_q[1].astype(u32) << 16)
        q23 = planes_q[2].astype(u32) | (planes_q[3].astype(u32) << 16)
        pairs.append((q01, q23))

    if not interleave:
        out_ref[:, :] = jnp.concatenate(
            [jnp.concatenate(pr, axis=1) for pr in pairs], axis=0)
        return

    # lane interleave of the u32 pairs: [a0 b0 a1 b1 ...]
    rows_p = []
    for q01, q23 in pairs:
        ra = pltpu.repeat(q01, 2, 1)
        rb = pltpu.repeat(q23, 2, 1)
        even = (jax.lax.broadcasted_iota(jnp.int32, ra.shape, 1) % 2) == 0
        rows_p.append(jnp.where(even, ra, rb))
    # row (sublane) interleave of the s phase rows
    out_ref[:, :] = jnp.stack(rows_p, axis=1).reshape(ti_h * s, 2 * ti_w)


def _build(kernel, color, *, tile_h, tile_w, out_u32, **kw):
    s = 4
    _, h, w = color.shape
    ho, wo = (h - 1) * s, (w - 1) * s
    ti_h, ti_w = tile_h, tile_w
    hp = pl.cdiv(h - 1, ti_h) * ti_h
    wp = pl.cdiv(w - 1, ti_w) * ti_w
    cpad = _padded(color, h, w, hp, wp)
    scratch = [pltpu.VMEM((3, ti_h + PAD_R, ti_w + PAD_C), cpad.dtype),
               pltpu.SemaphoreType.DMA]
    if out_u32:
        oshape, oblock = ((hp * s, wp * s // 2),
                          (ti_h * s, ti_w * s // 2))
        odt = jnp.uint32
    else:
        oshape, oblock = (hp * s, wp * s), (ti_h * s, ti_w * s)
        odt = jnp.uint16
    out = pl.pallas_call(
        functools.partial(kernel, s=s, ti_h=ti_h, ti_w=ti_w, bswap=True,
                          **kw),
        grid=(hp // ti_h, wp // ti_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(oblock, lambda r, c: (r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(oshape, odt),
        scratch_shapes=scratch,
    )(cpad)
    if out_u32:
        u16 = jax.lax.bitcast_convert_type(out, jnp.uint16)
        return u16.reshape(hp * s, wp * s)[:ho, :wo]
    return out[:ho, :wo]


@functools.partial(jax.jit, static_argnames=("variant", "tile_h", "tile_w"))
def render_v(color, variant, tile_h=64, tile_w=512):
    if variant == "fma":
        return _build(_kernel_fma, color, tile_h=tile_h, tile_w=tile_w,
                      out_u32=False)
    if variant == "sq2":
        return _build(_kernel_sq2, color, tile_h=tile_h, tile_w=tile_w,
                      out_u32=True, interleave=True)
    if variant == "sq2floor":
        return _build(_kernel_sq2, color, tile_h=tile_h, tile_w=tile_w,
                      out_u32=True, interleave=False)
    raise ValueError(variant)


def time_full_output(render_fn, color, n=8):
    @jax.jit
    def prog(c):
        return c, render_fn(c)

    def _sync(o):
        return np.asarray(o[:1, :1])

    prog(color)
    _sync(prog(color)[1])
    best = 1e9
    for _ in range(2):
        t0 = time.time(); r = prog(color); _sync(r[1]); t1 = time.time() - t0
        t0 = time.time()
        for _ in range(n):
            r = prog(r[0])
        _sync(r[1]); tn = time.time() - t0
        best = min(best, (tn - t1) / (n - 1))
    return best


def main():
    n = 4096
    color = jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(0), (3, n, n),
                           jnp.float32).astype(jnp.bfloat16))

    small = jax.random.uniform(jax.random.PRNGKey(1), (3, 257, 385),
                               jnp.float32).astype(jnp.bfloat16)
    ref = np.asarray(render_rgb565_pallas(small, s=4, tile_h=64, tile_w=256))
    for v in ("fma", "sq2"):
        try:
            got = np.asarray(render_v(small, v, tile_h=64, tile_w=256))
            eq = np.array_equal(ref, got)
            frac = float((ref != got).mean())
            print(f"{v:8s} vs base: bit-equal={eq} mismatch_frac={frac:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{v:8s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    t = time_full_output(lambda c: render_rgb565_pallas(c, s=4), color)
    print(f"base      {t*1e3:7.2f} ms", flush=True)
    for v in ("fma", "sq2", "sq2floor"):
        for th, tw in ((64, 512), (32, 512), (64, 256)):
            try:
                t = time_full_output(
                    lambda c, v=v, th=th, tw=tw: render_v(
                        c, v, tile_h=th, tile_w=tw), color)
                print(f"{v:9s} th={th:3d} tw={tw:4d} {t*1e3:7.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{v:9s} th={th:3d} tw={tw:4d} FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
