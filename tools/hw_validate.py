"""Hardware validation sweep: run when a real TPU is reachable.

Benchmarks every Pallas kernel against its jnp counterpart with the
dependency-chained timing that survives this machine's non-blocking
block_until_ready (utils/profiling.chain_time), checks numerics on-device,
and prints a table + recommended config defaults.

  python tools/hw_validate.py            # full sweep at 4096^2
  python tools/hw_validate.py --small    # quick sweep at 1024^2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf[..., :1, :1]))


def chain(fn, x0, n=8):
    sync(fn(x0))
    t0 = time.time()
    cur = x0
    for _ in range(1):
        cur = fn(cur)
    sync(cur)
    t1 = time.time() - t0
    t0 = time.time()
    cur = x0
    for _ in range(n):
        cur = fn(cur)
    sync(cur)
    tn = time.time() - t0
    return max((tn - t1) / (n - 1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()
    H = W = 1024 if args.small else 4096
    print(f"backend={jax.default_backend()} grid={H}x{W}")

    from esp32_fluid_simulation_tpu.ops.advect import advect
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    from esp32_fluid_simulation_tpu.ops.fd import divergence, subtract_gradient
    from esp32_fluid_simulation_tpu.ops.poisson import sor_solve
    from esp32_fluid_simulation_tpu.ops.pallas.sor import sor_solve_pallas
    from esp32_fluid_simulation_tpu.ops.pallas.project import project_fused_pallas
    from esp32_fluid_simulation_tpu.render.upscale import (upscale_bilinear,
                                                           pack_rgb565)
    from esp32_fluid_simulation_tpu.render.pallas_upscale import (
        render_rgb565_pallas)

    k = jax.random.PRNGKey(0)
    vel = jax.random.normal(k, (2, H, W), jnp.float32) * 5.0
    col = jax.random.uniform(k, (3, H, W), jnp.float32)
    d = jax.random.normal(k, (H, W), jnp.float32)
    rows = []

    def bench(name, fn, x0, check=None):
        try:
            ms = chain(fn, x0, args.n) * 1e3
            err = ""
            if check is not None:
                err = f" maxerr={check():.2e}"
            rows.append((name, ms))
            print(f"{name:34s} {ms:9.2f} ms{err}")
        except Exception as e:
            print(f"{name:34s} FAILED: {str(e)[:120]}")

    # advection
    bench("advect jnp (3ch)",
          jax.jit(lambda c: advect(c, vel, 1 / 30., False)), col)
    bench("advect pallas static (3ch)",
          jax.jit(lambda c: advect_pallas(c, vel, 1 / 30., False, 12,
                                          static_unroll=True)), col)
    bench("advect pallas (3ch)",
          jax.jit(lambda c: advect_pallas(c, vel, 1 / 30., False, 12)), col,
          check=lambda: float(jnp.max(jnp.abs(
              advect(col, jnp.clip(vel, -360, 360), 1 / 30., False)
              - advect_pallas(col, vel, 1 / 30., False, 12)))))
    # projection
    bench("projection jnp",
          jax.jit(lambda v: subtract_gradient(
              v, sor_solve(divergence(v), 1.0, 10, 1.96), 1.0)), vel)
    bench("sor pallas (solver only)",
          jax.jit(lambda x: sor_solve_pallas(x, 1.0, 10, 1.96)), d)
    bench("projection fused pallas",
          jax.jit(lambda v: project_fused_pallas(v, 1.0, 10, 1.96)[0]), vel)
    # render (fold one output pixel back in to chain the dependency)
    bench("render jnp 4x",
          jax.jit(lambda c: c * (1.0 + 0.0 * pack_rgb565(
              upscale_bilinear(c, 4))[0, 0].astype(jnp.float32))), col)
    bench("render pallas 4x",
          jax.jit(lambda c: c * (1.0 + 0.0 * render_rgb565_pallas(
              c, 4)[0, 0].astype(jnp.float32))), col)

    # full step A/B
    from esp32_fluid_simulation_tpu import (SimConfig, Impulses, init_state,
                                            make_step)
    for name, kw in [("step jnp", dict(advect_impl="jnp")),
                     ("step fused", dict(solver="fused_pallas",
                                         advect_impl="pallas"))]:
        cfg = SimConfig(shape=(H, W), scaling=1, **kw)
        fn = make_step(cfg, donate=False)
        none = Impulses.none(cfg)
        st = init_state(cfg)
        bench(name, lambda s_: fn(s_, none), st)

    print(json.dumps({n: round(ms, 2) for n, ms in rows}))


if __name__ == "__main__":
    main()
