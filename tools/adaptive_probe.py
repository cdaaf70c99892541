"""Residual-targeted solve A/B (VERDICT r4 next #9): fixed-10 RB-SOR vs
the adaptive early-exit solve on an evolved production state — sweeps
actually spent, residual achieved, and ms per solve, side by side.

  python tools/adaptive_probe.py [size] [tol]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-3
    from esp32_fluid_simulation_tpu import SimConfig, init_state, make_step
    from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl
    from esp32_fluid_simulation_tpu.ops.fd import divergence
    from esp32_fluid_simulation_tpu.ops.poisson import (
        sor_solve, sor_solve_adaptive, poisson_residual)

    cfg = SimConfig(shape=(size, size), scaling=1, solver="fused_pallas",
                    advect_impl="pallas", color_dtype="bfloat16")
    st = init_state(cfg)
    fn = make_step(cfg, donate=False)
    for t in range(40):
        st = fn(st, scripted_swirl(cfg, t))
    jnp.sum(st.velocity[..., :1, :1]).block_until_ready()

    d = divergence(st.velocity.astype(jnp.float32), cfg.dx)

    def rnorm(p):
        r = poisson_residual(p, d, cfg.dx)
        return float(jnp.sqrt(jnp.mean(r * r)))

    fixed = jax.jit(lambda d: sor_solve(d, cfg.dx, 10, cfg.omega))
    adapt = jax.jit(lambda d: sor_solve_adaptive(
        d, cfg.dx, max_iters=40, omega=cfg.omega, tol=tol, check_every=2))

    p_f = fixed(d)
    p_a, iters, res = adapt(d)
    print(f"fixed-10:  residual {rnorm(p_f):.3e}")
    print(f"adaptive:  residual {float(res):.3e} in {int(iters)} sweeps "
          f"(tol {tol:g}, cap 40)")

    def chain_ms(f, n=8):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = f(d)
        jax.block_until_ready(out)
        jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1, :1]
                ).block_until_ready()
        return (time.time() - t0) / n * 1e3

    chain_ms(fixed, 2)
    chain_ms(adapt, 2)
    ms_f = chain_ms(fixed)
    ms_a = chain_ms(adapt)
    print(f"fixed-10:  {ms_f:.2f} ms/solve   "
          f"quality/ms = {1.0 / max(rnorm(p_f), 1e-12) / ms_f:.1f}")
    print(f"adaptive:  {ms_a:.2f} ms/solve   "
          f"quality/ms = {1.0 / max(float(res), 1e-12) / ms_a:.1f}")


if __name__ == "__main__":
    main()
