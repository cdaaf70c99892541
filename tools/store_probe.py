"""Probe: output-store rate by dtype at the render kernel's scale.

The 4x render kernel writes 512 MB of uint16 (16384^2 RGB565).  This probe
measures a trivial Pallas kernel (read small f32 tile -> write a full output
block) for several output formulations of the SAME 512 MB:

  u16    : (H, W) uint16          — what the render kernel does today
  u32    : (H, W/2) uint32        — two pixels packed per lane
  u16_2x : (H, W) uint16, tile_w doubled

Run on the real chip: `python tools/store_probe.py`.
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from esp32_fluid_simulation_tpu.utils.profiling import chain_time  # noqa: E402

H, W = 16384, 16384  # 512 MB of u16


def make(dtype, ti_h, ti_w, wo):
    def kernel(x_ref, o_ref):
        v = x_ref[0, 0]
        o_ref[:, :] = jnp.full((ti_h, ti_w), 1, dtype) + v.astype(dtype)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            grid=(H // ti_h, wo // ti_w),
            in_specs=[pl.BlockSpec((8, 128), lambda r, c: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ti_h, ti_w), lambda r, c: (r, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, wo), dtype),
        )(x)

    return f


def main():
    x = jnp.zeros((8, 128), jnp.uint32)
    rows = [
        ("u16 64x512", jnp.uint16, 64, 512, W),
        ("u16 64x1024", jnp.uint16, 64, 1024, W),
        ("u16 128x512", jnp.uint16, 128, 512, W),
        ("u16 256x2048", jnp.uint16, 256, 2048, W),
        ("u32 64x256", jnp.uint32, 64, 256, W // 2),
        ("u32 64x512", jnp.uint32, 64, 512, W // 2),
        ("u32 128x1024", jnp.uint32, 128, 1024, W // 2),
    ]
    for name, dt, th, tw, wo in rows:
        f = make(dt, th, tw, wo)
        # chain via a dependency on one output element
        def step(x, f=f, dt=dt):
            o = f(x)
            return (x + o[:1, :1].astype(jnp.uint32) * 0).astype(jnp.uint32)
        t = chain_time(step, x, n=8)
        gb = H * wo * jnp.dtype(dt).itemsize / 1e9
        print(f"{name:14s}  {t*1e3:7.2f} ms   {gb / t:7.1f} GB/s")


if __name__ == "__main__":
    main()
