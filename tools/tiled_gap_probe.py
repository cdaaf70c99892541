"""Composition-gap probe for the tiled-ensemble supergrid step: the stage
probe (tools/tiled_stage_probe.py) sums standalone stages to ~12.8 ms but the
composed step runs ~15.6 ms.  This times jit-composed PREFIXES of the step so
the overhead pins to a specific seam:

  A  vel self-advect
  AB A + member impulse scatter
  ABC AB + fused member projection
  ABCD ABC + dye advect (== the whole step body)

  python tools/tiled_gap_probe.py [member_size] [n_members]
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

    def adv_vel(v):
        return advect_pallas(v, v, cfg.dt, True, max_disp=md,
                             member=(mh, mw), self_advect=True)

    def scat(v):
        return apply_fn(v)

    def proj(v):
        return project_fused_pallas(v, cfg.dx, cfg.sor_iters, cfg.omega,
                                    member=(mh, mw))[0]

    def dye(c, v):
        return advect_pallas(c, v, cfg.dt, False, max_disp=md,
                             member=(mh, mw), clip01=True)

    A = jax.jit(adv_vel)
    AB = jax.jit(lambda v: scat(adv_vel(v)))
    ABC = jax.jit(lambda v: proj(scat(adv_vel(v))))

    def abcd(s):
        v = proj(scat(adv_vel(s.velocity)))
        return v, dye(s.color, v)

    def abcd_state(s):
        from esp32_fluid_simulation_tpu.state import SimState
        v, c = abcd(s)
        return SimState(velocity=v, color=c, step=s.step + 1)

    ABCD = jax.jit(abcd_state)

    print(f"A    vel advect:            {chain_ms(A, vel):.2f} ms",
          flush=True)
    print(f"AB   + impulse scatter:     {chain_ms(AB, vel):.2f} ms",
          flush=True)
    print(f"ABC  + projection:          {chain_ms(ABC, vel):.2f} ms",
          flush=True)
    print(f"ABCD + dye (whole body):    {chain_ms(ABCD, st):.2f} ms",
          flush=True)
    print(f"step (for reference):       {chain_ms(step, st):.2f} ms",
          flush=True)

    # standalone dye on the evolved vel, for the seam math
    D = jax.jit(lambda c: dye(c, vel))
    print(f"D    dye standalone:        {chain_ms(D, color):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
