"""On-device tile/impl sweep for the fused upscale+RGB565 render kernel.

Motivated by tools/store_probe.py: plain u16 output stores at the render's
scale run at 592 GB/s with (64, 1024) output tiles but only ~135 GB/s with
the (256, 2048) tiles the round-2 default (tile_h=64, tile_w=512, s=4)
produces.  This sweep times the REAL kernel (both impls) across tile
shapes at 4096^2 -> 16384^2 and checks bit-exactness vs the jnp path once.

  python tools/render_probe.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from esp32_fluid_simulation_tpu.render.pallas_upscale import (  # noqa: E402
    render_rgb565_pallas)
from esp32_fluid_simulation_tpu.utils.profiling import chain_time  # noqa: E402


def main():
    n = 4097
    s = 4
    key = jax.random.PRNGKey(0)
    color = jax.random.uniform(key, (3, n, n), jnp.float32)
    color = jax.block_until_ready(color)
    gb = ((n - 1) * s) ** 2 * 2 / 1e9 + 3 * n * n * 4 / 1e9

    rows = []
    for impl in ("transpose", "planes"):
        for th, tw in ((16, 256), (16, 512), (32, 256), (32, 512),
                       (8, 1024), (16, 1024), (32, 1024), (64, 256),
                       (64, 512)):
            def step(c, th=th, tw=tw, impl=impl):
                o = render_rgb565_pallas(c, s=s, tile_h=th, tile_w=tw,
                                         impl=impl)
                return c + (o[0, 0] > jnp.uint16(0)).astype(jnp.float32)
            try:
                t = chain_time(step, color, n=6)
            except Exception as e:  # noqa: BLE001
                print(f"{impl:10s} th={th:3d} tw={tw:5d}  FAILED "
                      f"{type(e).__name__}: {str(e)[:80]}")
                continue
            rows.append((t, impl, th, tw))
            print(f"{impl:10s} th={th:3d} tw={tw:5d}  {t*1e3:7.2f} ms  "
                  f"{gb/t:6.1f} GB/s", flush=True)

    rows.sort()
    t, impl, th, tw = rows[0]
    print(f"\nBEST: impl={impl} tile_h={th} tile_w={tw}  {t*1e3:.2f} ms")

    # bit-exactness of the winner vs the jnp reference path at a small size
    from esp32_fluid_simulation_tpu.render.upscale import (
        upscale_bilinear, pack_rgb565)
    small = jax.random.uniform(jax.random.PRNGKey(1), (3, 257, 385),
                               jnp.float32)
    ref = pack_rgb565(upscale_bilinear(small, s), bswap=True)
    got = render_rgb565_pallas(small, s=s, tile_h=th, tile_w=tw, impl=impl)
    ok = bool(np.array_equal(np.asarray(ref), np.asarray(got)))
    print("bit-exact vs jnp:", ok)


if __name__ == "__main__":
    main()
