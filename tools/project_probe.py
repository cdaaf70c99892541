"""Probe the fused projection + SOR kernels on hardware: timing at 4096^2
and A/B vs the composed jnp ops.

  python tools/project_probe.py [--size 4096] [--ab]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from advect_probe import swirl_velocity, chain_ms  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ab", action="store_true")
    args = ap.parse_args()
    h = w = args.size

    from esp32_fluid_simulation_tpu.ops.pallas.project import (
        project_fused_pallas)
    from esp32_fluid_simulation_tpu.ops.pallas.sor import sor_solve_pallas

    vel = swirl_velocity(h, w)
    res = {"backend": jax.default_backend(), "size": args.size}

    fnp = jax.jit(lambda v: project_fused_pallas(v, 1.0, args.iters, 1.96)[0])
    res["project_fused_ms"] = chain_ms(fnp, vel, args.n)

    d = jax.random.normal(jax.random.PRNGKey(0), (h, w), jnp.float32)
    fns = jax.jit(lambda x: sor_solve_pallas(x, 1.0, args.iters, 1.96))
    # chain via output (same shape)
    res["sor_solve_ms"] = chain_ms(fns, d, args.n)
    res["us_per_sweep"] = res["sor_solve_ms"] / args.iters * 1e3

    if args.ab:
        from esp32_fluid_simulation_tpu.ops.fd import (divergence,
                                                       subtract_gradient)
        from esp32_fluid_simulation_tpu.ops.poisson import sor_solve
        dv = divergence(vel, 1.0)
        p_ref = sor_solve(dv, 1.0, args.iters, 1.96)
        v_ref = subtract_gradient(vel, p_ref, 1.0)
        v_out, p_out = project_fused_pallas(vel, 1.0, args.iters, 1.96)
        res["ab_project_v_maxabs"] = float(
            np.max(np.abs(np.asarray(v_out) - np.asarray(v_ref))))
        res["ab_project_p_maxabs"] = float(
            np.max(np.abs(np.asarray(p_out) - np.asarray(p_ref))))
        p2 = fns(dv)
        res["ab_sor_maxabs"] = float(
            np.max(np.abs(np.asarray(p2) - np.asarray(p_ref))))

    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
