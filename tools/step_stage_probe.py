"""Stage-level breakdown of the production step at a given size.

Times each stage of the fused-kernel production step (vel advect, impulse
scatter, fused projection, dye advect, render) in isolation on an EVOLVED
state (30 warm steps with swirl forcing), plus the whole fused
step+render program — the honest chain the headline measures.

  python tools/step_stage_probe.py [size] [render_s]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., :1, :1]))


def chain_ms(fn, x0, n=8):
    sync(fn(x0))
    t0 = time.time()
    sync(fn(x0))
    t1 = time.time() - t0
    t0 = time.time()
    cur = x0
    for _ in range(n):
        cur = fn(cur)
    sync(cur)
    tn = time.time() - t0
    return max((tn - t1) / (n - 1), 1e-9) * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    render_s = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from esp32_fluid_simulation_tpu import (SimConfig, init_state, make_step,
                                            render_rgb565)
    from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl
    from esp32_fluid_simulation_tpu.models.stable_fluids import (
        apply_impulses, _advect_by)
    from esp32_fluid_simulation_tpu.ops.pallas.project import (
        project_fused_pallas)

    cfg = SimConfig(shape=(size, size), scaling=render_s,
                    solver="fused_pallas", advect_impl="pallas",
                    color_dtype="bfloat16")
    st = init_state(cfg)
    fn = make_step(cfg, donate=False)
    for t in range(30):
        st = fn(st, scripted_swirl(cfg, t))
    sync(st)
    print("state evolved", flush=True)

    adv = _advect_by(cfg)
    imp = scripted_swirl(cfg, 99)
    res = {"size": size}

    va = jax.jit(lambda v: adv(v, v, cfg.dt, no_slip=True))
    res["vel_advect_ms"] = chain_ms(va, st.velocity)
    print("vel_advect", res["vel_advect_ms"], flush=True)

    pj = jax.jit(lambda v: project_fused_pallas(v, cfg.dx, cfg.sor_iters,
                                                cfg.omega)[0])
    res["project_ms"] = chain_ms(pj, st.velocity)
    print("project", res["project_ms"], flush=True)

    # velocity passed as an ARG, not a closure constant: a closed-over
    # 8192^2 f32 velocity (536 MB) gets serialized into the program and
    # blows the remote-compile request limit (HTTP 413)
    da = jax.jit(lambda c, v: adv(c, v, cfg.dt, no_slip=False, clip01=True))
    res["dye_advect_ms"] = chain_ms(lambda c: da(c, st.velocity), st.color)
    print("dye_advect", res["dye_advect_ms"], flush=True)

    ia = jax.jit(lambda v: apply_impulses(v, imp))
    res["impulse_ms"] = chain_ms(ia, st.velocity)
    print("impulse", res["impulse_ms"], flush=True)

    # chain the (unchanged) color through; the frame is a program output so
    # it is fully materialized each call
    rn = jax.jit(lambda c: (c, render_rgb565(c, s=render_s,
                                             unit_range=True)))
    res["render_ms"] = chain_ms(lambda c: rn(c)[0], st.color)
    print("render", res["render_ms"], flush=True)

    @jax.jit
    def step_render(s):
        s2 = fn(s, imp)
        return s2, render_rgb565(s2.color, s=render_s, unit_range=True)

    def one(s):
        return step_render(s)[0]

    res["full_step_render_ms"] = chain_ms(one, st)
    res["fps"] = 1e3 / res["full_step_render_ms"]
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
