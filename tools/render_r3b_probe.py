"""Round-3b render probe: s^2 phase-plane formulation vs the shipped
transpose pipeline, at the production point (bf16 dye, 4096^2 nodes -> 4x).

The shipped kernel's marginal in-program cost is ~5.8 ms (17.0 ms fused
step+render4x minus 11.2 ms step) against a ~0.8 ms traffic roofline; the
suspects are the two repeat-copies per channel per stage and the two
in-kernel transposes (f32 forward, u16 back).

The s^2 formulation computes, per (row-phase p, col-phase q), the exact
two-stage lerp at INPUT resolution with SCALAR weights (p/s, q/s) — the
same float op order as the jnp path, so bit-exactness is preserved — and
interleaves at the end in u16/u32:

  R_p[i,k]   = cw[i,k]*(1-p/s)   + cw[i+1,k]*(p/s)      (s planes, 3ch)
  C_pq[i,k]  = R_p[i,k]*(1-q/s)  + R_p[i,k+1]*(q/s)     (s^2 planes, 3ch)
  W_pq       = quant+pack565(C_pq)                       (u16)
  pair q01   = W_p0 | W_p1 << 16  (u32: out cols 4k,4k+1)   [s=4]
  pair q23   = W_p2 | W_p3 << 16  (u32: out cols 4k+2,4k+3)
  lane ilv   = stack(q01, q23, axis=-1).reshape           (u32 pairs)
  row ilv    = stack over p on a new axis=1 + reshape     (sublanes)

Variants:
  base    : shipped render_rgb565_pallas (tile sweep)
  sq      : s^2 planes, full in-kernel interleave as above
  sqfloor : s^2 planes, stores WITHOUT interleave (wrong image; lower
            bound for this formulation's compute+store)

Usage: python tools/render_r3b_probe.py [--n 4096] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
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


def _sq_kernel(c_hbm, out_ref, cwin_vmem, sem, *, s, ti_h, ti_w, bswap,
               interleave):
    _fetch(c_hbm, cwin_vmem, sem, pl.program_id(0), pl.program_id(1),
           ti_h=ti_h, ti_w=ti_w)
    f32 = jnp.float32
    u32 = jnp.uint32
    chans = []
    for ch in range(3):
        cw = cwin_vmem[ch].astype(f32)[:ti_h + 1, :ti_w + 1]
        chans.append(cw * f32(1 << CH_BITS[ch]))  # prescale (exact, 2^k)

    # W[p][q]: packed u16 plane (ti_h, ti_w)
    pairs = []  # per p: (q01, q23) u32 pairs
    for p in range(s):
        a = f32(p) / f32(s)
        planes_q = []
        for q in range(s):
            b = f32(q) / f32(s)

            def bits(ch, nbits):
                cw = chans[ch]
                # row lerp at phase a (phase 0 = plain rows, no flops)
                r0 = cw[:ti_h, :]
                if p:
                    r0 = r0 * (1.0 - a) + cw[1:ti_h + 1, :] * a
                v = r0[:, :ti_w]
                if q:
                    v = v * (1.0 - b) + r0[:, 1:ti_w + 1] * b
                qv = v.astype(jnp.int32)
                return jnp.clip(qv, 0, (1 << nbits) - 1)

            word = (bits(0, 5) << 11) | (bits(1, 6) << 5) | bits(2, 5)
            if bswap:
                word = ((word << 8) | (word >> 8)) & 0xFFFF
            planes_q.append(word)
        q01 = planes_q[0].astype(u32) | (planes_q[1].astype(u32) << 16)
        q23 = planes_q[2].astype(u32) | (planes_q[3].astype(u32) << 16)
        pairs.append((q01, q23))

    if not interleave:
        # floor: dump planes contiguously (wrong image)
        out_ref[:, :] = jnp.concatenate(
            [jnp.concatenate(pr, axis=1) for pr in pairs], axis=0)
        return

    # lane interleave: (ti_h, ti_w, 2) -> (ti_h, 2*ti_w) u32  == cols
    rows_p = [jnp.stack(pr, axis=-1).reshape(ti_h, 2 * ti_w)
              for pr in pairs]
    # row interleave: (ti_h, s, 2*ti_w) -> (ti_h*s, 2*ti_w)
    out_ref[:, :] = jnp.stack(rows_p, axis=1).reshape(ti_h * s, 2 * ti_w)


@functools.partial(jax.jit,
                   static_argnames=("s", "tile_h", "tile_w", "interleave"))
def render_sq(color, s=4, tile_h=64, tile_w=512, interleave=True):
    _, h, w = color.shape
    ho, wo = (h - 1) * s, (w - 1) * s
    ti_h, ti_w = tile_h, tile_w
    hp = pl.cdiv(h - 1, ti_h) * ti_h
    wp = pl.cdiv(w - 1, ti_w) * ti_w
    cpad = _padded(color, h, w, hp, wp)
    kw = dict(s=s, ti_h=ti_h, ti_w=ti_w, bswap=True, interleave=interleave)
    scratch = [pltpu.VMEM((3, ti_h + PAD_R, ti_w + PAD_C), cpad.dtype),
               pltpu.SemaphoreType.DMA]
    out = pl.pallas_call(
        functools.partial(_sq_kernel, **kw),
        grid=(hp // ti_h, wp // ti_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ti_h * s, ti_w * s // 2),
                               lambda r, c: (r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp * s, wp * s // 2), jnp.uint32),
        scratch_shapes=scratch,
    )(cpad)
    u16 = jax.lax.bitcast_convert_type(out, jnp.uint16)
    return u16.reshape(hp * s, wp * s)[:ho, :wo]


def time_full_output(render_fn, color, n=8):
    """Marginal per-render with the frame as a materialized program output."""
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    n = args.n
    dt = jnp.dtype(args.dtype)
    color = jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(0), (3, n, n),
                           jnp.float32).astype(dt))

    small = jax.random.uniform(jax.random.PRNGKey(1), (3, 257, 385),
                               jnp.float32).astype(dt)
    ref = np.asarray(render_rgb565_pallas(small, s=4, tile_h=64, tile_w=256))
    try:
        got = np.asarray(render_sq(small, tile_h=64, tile_w=256))
        print("sq bit-exact:", bool(np.array_equal(ref, got)), flush=True)
    except Exception as e:  # noqa: BLE001
        print("sq FAILED:", type(e).__name__, str(e)[:200], flush=True)

    tiles = ((64, 512), (32, 512), (128, 512), (64, 256), (64, 1024),
             (32, 1024))
    for th, tw in tiles:
        try:
            t = time_full_output(
                lambda c, th=th, tw=tw: render_rgb565_pallas(
                    c, s=4, tile_h=th, tile_w=tw), color)
            print(f"base    th={th:3d} tw={tw:4d}  {t*1e3:7.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"base    th={th:3d} tw={tw:4d}  FAILED "
                  f"{type(e).__name__}: {str(e)[:90]}", flush=True)
    for label, ilv in (("sq", True), ("sqfloor", False)):
        for th, tw in tiles:
            try:
                t = time_full_output(
                    lambda c, th=th, tw=tw, i=ilv: render_sq(
                        c, tile_h=th, tile_w=tw, interleave=i), color)
                print(f"{label:7s} th={th:3d} tw={tw:4d}  {t*1e3:7.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{label:7s} th={th:3d} tw={tw:4d}  FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
