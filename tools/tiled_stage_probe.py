"""Stage-level breakdown of the tiled-ensemble supergrid step (BASELINE
config 4): where the ~2.5x gap vs the equal-area single-domain step lives
(VERDICT r4 weak #3).

Times, on an evolved supergrid state with all-members swirl forcing:
  - velocity self-advect (member mode)
  - the standalone per-member impulse scatter
  - fused projection (member mode), without and (if wired) with impulses
  - dye advect (member mode, clip01)
  - the whole _step_tiled program
and the equal-area single-domain stages for comparison.

  python tools/tiled_stage_probe.py [member_size] [n_members]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
    msize = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_members = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    import functools
    from esp32_fluid_simulation_tpu import SimConfig
    from esp32_fluid_simulation_tpu.models.stable_fluids import (
        init_state, _step_tiled)
    from esp32_fluid_simulation_tpu.models.ensemble import (
        tiled_ensemble_config, stack_impulses, _apply_member_impulses)
    from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    from esp32_fluid_simulation_tpu.ops.pallas.project import (
        project_fused_pallas)

    mcfg = SimConfig(shape=(msize, msize), scaling=1,
                     color_dtype="bfloat16")
    cfg, gh, gw = tiled_ensemble_config(mcfg, n_members)
    mh, mw = mcfg.shape
    print(f"supergrid {cfg.shape} = {gh}x{gw} members of {mh}x{mw}",
          flush=True)
    imp = stack_impulses([scripted_swirl(mcfg, 7 * m)
                          for m in range(n_members)])
    apply_fn = functools.partial(_apply_member_impulses, imp=imp,
                                 gh=gh, gw=gw, mh=mh, mw=mw)

    st = init_state(cfg)
    step = jax.jit(lambda s: _step_tiled(s, None, cfg,
                                         apply_fn=lambda v: apply_fn(v)))
    for _ in range(30):
        st = step(st)
    sync(st)
    print("state evolved", flush=True)

    vel, color = st.velocity, st.color
    md = cfg.advect_max_disp

    adv_vel = jax.jit(lambda v: advect_pallas(
        v, v, cfg.dt, True, max_disp=md, member=(mh, mw),
        self_advect=True))
    print(f"vel advect (member): {chain_ms(adv_vel, vel):.2f} ms",
          flush=True)

    scat = jax.jit(lambda v: apply_fn(v))
    print(f"impulse scatter (standalone): {chain_ms(scat, vel):.2f} ms",
          flush=True)

    proj = jax.jit(lambda v: project_fused_pallas(
        v, cfg.dx, cfg.sor_iters, cfg.omega, member=(mh, mw))[0])
    print(f"projection (member): {chain_ms(proj, vel):.2f} ms", flush=True)

    adv_dye = jax.jit(lambda c: advect_pallas(
        c, vel, cfg.dt, False, max_disp=md, member=(mh, mw), clip01=True))
    print(f"dye advect (member): {chain_ms(adv_dye, color):.2f} ms",
          flush=True)

    print(f"whole tiled step: {chain_ms(step, st):.2f} ms", flush=True)

    # equal-area single-domain comparators
    scfg = SimConfig(shape=cfg.shape, scaling=1, solver="fused_pallas",
                     advect_impl="pallas", color_dtype="bfloat16")
    adv_vel_s = jax.jit(lambda v: advect_pallas(
        v, v, scfg.dt, True, max_disp=scfg.advect_max_disp,
        self_advect=True))
    print(f"vel advect (single): {chain_ms(adv_vel_s, vel):.2f} ms",
          flush=True)
    proj_s = jax.jit(lambda v: project_fused_pallas(
        v, scfg.dx, scfg.sor_iters, scfg.omega)[0])
    print(f"projection (single): {chain_ms(proj_s, vel):.2f} ms",
          flush=True)
    adv_dye_s = jax.jit(lambda c: advect_pallas(
        c, vel, scfg.dt, False, max_disp=scfg.advect_max_disp,
        clip01=True))
    print(f"dye advect (single): {chain_ms(adv_dye_s, color):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
