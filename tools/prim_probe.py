"""Micro-probe: cost of individual Mosaic vector primitives at render-kernel
shapes, to locate where the 7.1 ms (vs ~2 ms roofline) goes.

Each kernel reads a (256, 384) f32 VMEM block and stores a (256, 1024) u16
block (the render tile's real output), with the tested primitive in the
middle.  grid matches the real render grid (64 x 16 tiles at 4096^2).

  python tools/prim_probe.py
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esp32_fluid_simulation_tpu.utils.profiling import chain_time  # noqa: E402

TH, TW = 64, 256           # render input tile
THO, TWO = 256, 1024       # render output tile (s=4)
GRID = (64, 16)            # 4096^2 tiles


def body_copy(x):
    """Baseline: broadcast a scalar to the output shape."""
    return jnp.full((THO, TWO), 1.0, jnp.float32) + x[0, 0]


def body_subrep(x):
    """Sublane repeat x4: (64, 256) -> (256, 256), then pad to out width."""
    r = jnp.repeat(x[:TH, :TW], 4, axis=0)               # (256, 256)
    return jnp.concatenate([r, r, r, r], axis=1)          # (256, 1024)


def body_lane_slice(x):
    """Unaligned lane slice + lerp at (256, 257) width."""
    r = jnp.repeat(x[:TH, :TW + 1], 4, axis=0)            # (256, 257)
    v = r[:, :TW] * 0.5 + r[:, 1:TW + 1] * 0.5            # (256, 256)
    return jnp.concatenate([v, v, v, v], axis=1)


def body_t_f32(x):
    """f32 transpose (256, 256) -> (256, 256) (square, lane<->sublane)."""
    r = jnp.repeat(x[:TH, :TW], 4, axis=0)                # (256, 256)
    t = r.T
    return jnp.concatenate([t, t, t, t], axis=1)


def body_t_u16(x):
    """u16 transpose (1024, 256) -> (256, 1024) — the render's final move."""
    r = jnp.repeat(x[:TH, :TW], 4, axis=0)                # (256, 256)
    w = jnp.concatenate([r, r, r, r], axis=0).astype(jnp.uint16)  # (1024,256)
    return w.T.astype(jnp.float32)


def body_quantpack(x):
    """quantize x3 + pack565 at output res, no relayouts."""
    v = jnp.full((THO, TWO), 0.5, jnp.float32) + x[0, 0]
    q5 = jnp.clip((v * 32.0).astype(jnp.int32), 0, 31)
    q6 = jnp.clip((v * 64.0).astype(jnp.int32), 0, 63)
    w = (q5 << 11) | (q6 << 5) | q5
    w = ((w << 8) | (w >> 8)) & 0xFFFF
    return w.astype(jnp.float32)


def body_lerp_full(x):
    """3ch lerp at output res (the unavoidable VPU work), no relayouts."""
    acc = jnp.zeros((THO, TWO), jnp.float32)
    wa = (jax.lax.broadcasted_iota(jnp.int32, (THO, TWO), 1) % 4
          ).astype(jnp.float32) * 0.25
    for _ in range(3):
        a = jnp.full((THO, TWO), 0.25, jnp.float32) + x[0, 0]
        b = jnp.full((THO, TWO), 0.75, jnp.float32) + x[0, 1]
        acc += a * (1.0 - wa) + b * wa
    return acc


BODIES = {
    "copy": body_copy,
    "subrep x4": body_subrep,
    "lane slice+lerp": body_lane_slice,
    "t f32 256^2": body_t_f32,
    "t u16 1024x256": body_t_u16,
    "quant+pack": body_quantpack,
    "lerp 3ch full": body_lerp_full,
}


def make(name):
    body = BODIES[name]

    def kernel(x_ref, o_ref):
        v = body(x_ref[:, :])
        if v.dtype != jnp.uint16:
            v = v.astype(jnp.int32).astype(jnp.uint16)
        o_ref[:, :] = v

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            grid=GRID,
            in_specs=[pl.BlockSpec((TH + 8, TW + 128),
                                   lambda r, c: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((THO, TWO), lambda r, c: (r, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID[0] * THO, GRID[1] * TWO),
                                           jnp.uint16),
        )(x)

    return f


def main():
    x = jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(0), (TH + 8, TW + 128),
                           jnp.float32))
    for name in BODIES:
        f = make(name)

        def step(x, f=f):
            o = f(x)
            return x + o[:1, :1].astype(jnp.float32)

        try:
            t = chain_time(step, x, n=6)
            print(f"{name:18s} {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
