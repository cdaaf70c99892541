"""Min-of-3 focused timing of the top render-kernel configs (noise-robust).

  python tools/render_focus_probe.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from esp32_fluid_simulation_tpu.render.pallas_upscale import (  # noqa: E402
    render_rgb565_pallas)
from esp32_fluid_simulation_tpu.utils.profiling import chain_time  # noqa: E402


def main():
    n = 4097
    color = jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(0), (3, n, n), jnp.float32))
    cfgs = [
        ("transpose", 64, 256, False),
        ("transpose", 64, 256, True),
        ("transpose", 32, 1024, False),
        ("transpose", 32, 1024, True),
        ("transpose", 64, 512, True),
        ("planes", 16, 1024, True),
    ]
    for impl, th, tw, ur in cfgs:
        def step(c, impl=impl, th=th, tw=tw, ur=ur):
            o = render_rgb565_pallas(c, s=4, tile_h=th, tile_w=tw,
                                     impl=impl, unit_range=ur)
            return c + (o[0, 0] > jnp.uint16(0)).astype(jnp.float32)
        ts = [chain_time(step, color, n=6) for _ in range(3)]
        print(f"{impl:10s} th={th:3d} tw={tw:5d} ur={int(ur)}  "
              f"min {min(ts)*1e3:6.2f} ms   all "
              f"{[round(t*1e3, 2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
