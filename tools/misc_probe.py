"""Hardware probe for the remaining hot paths: odd-shape SOR sweep, the
fused 4x render, and the 3D smoke step (jnp vs pallas advect).

  python tools/misc_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from advect_probe import chain_ms  # noqa: E402


def main():
    res = {"backend": jax.default_backend()}

    # odd-shape SOR sweep (the driver metric shape)
    from esp32_fluid_simulation_tpu.ops.pallas.sor import sor_solve_pallas
    d = jax.random.normal(jax.random.PRNGKey(0), (4097, 4097), jnp.float32)
    fns = jax.jit(lambda x: sor_solve_pallas(x, 1.0, 10, 1.96))
    ms = chain_ms(fns, d, 8)
    res["sor_4097_ms"] = ms
    res["us_per_sweep_4097"] = ms * 1e3 / 10

    # fused 4x render 4096^2 -> 16384^2 (auto-dispatches to the kernel)
    from esp32_fluid_simulation_tpu.render import render_rgb565
    c = jax.random.uniform(jax.random.PRNGKey(1), (3, 4096, 4096),
                           jnp.bfloat16)

    def rchain(x):
        f = render_rgb565(x, s=4)
        return (x + f[0, 0].astype(x.dtype) * 1e-9).astype(x.dtype)

    res["render4x_4096_ms"] = chain_ms(jax.jit(rchain), c, 6)

    # 3D smoke step at 128x256x256 (fits comfortably; 256^3 next)
    from esp32_fluid_simulation_tpu.models.smoke3d import (
        SmokeConfig, init_smoke, make_smoke_step)
    for impl in ("jnp", "pallas"):
        cfg = SmokeConfig(shape=(128, 256, 256), solver="sor", sor_iters=6,
                          advect_impl=impl)
        st = init_smoke(cfg)
        fn = make_smoke_step(cfg, donate=False)
        for _ in range(3):
            st = fn(st)   # spin up the plume

        def one(s, fn=fn):
            return fn(s)

        res[f"smoke3d_128_256_{impl}_ms"] = chain_ms(one, st, 5)

    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
