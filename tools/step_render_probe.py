"""A/B the fused step_render (RGB565 pack riding the dye-advect store) vs
the composed step + render_rgb565 program at the headline config.

Asserts the state AND frame are bit-identical, then times both.

  python tools/step_render_probe.py [size]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from esp32_fluid_simulation_tpu import (SimConfig, init_state, make_step,
                                            make_step_render, render_rgb565)
    from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl
    from esp32_fluid_simulation_tpu.utils.profiling import chain_time

    cfg = SimConfig(shape=(size, size), scaling=1, solver="fused_pallas",
                    advect_impl="pallas", color_dtype="bfloat16")
    st = init_state(cfg)
    fn = make_step(cfg, donate=False)
    for t in range(30):
        st = fn(st, scripted_swirl(cfg, t))
    jax.block_until_ready(st.velocity)
    imp = scripted_swirl(cfg, 31)

    fused = make_step_render(cfg, donate=False)

    @jax.jit
    def composed(s, i):
        s = fn(s, i)
        return s, render_rgb565(s.color, s=1, unit_range=cfg.clamps_dye)

    sf, ff = fused(st, imp)
    sc, fc = composed(st, imp)
    ok_v = bool(jnp.all(sf.velocity == sc.velocity))
    ok_c = bool(jnp.all(sf.color == sc.color))
    ok_f = bool(jnp.all(ff == fc))
    print(f"bit_exact vel={ok_v} color={ok_c} frame={ok_f}", flush=True)

    tf = chain_time(lambda s: fused(s, imp)[0], st, n=20)
    tc = chain_time(lambda s: composed(s, imp)[0], st, n=20)
    print(f"fused {tf*1e3:.3f} ms ({1/tf:.1f} FPS)  "
          f"composed {tc*1e3:.3f} ms ({1/tc:.1f} FPS)", flush=True)
    assert ok_v and ok_c and ok_f


if __name__ == "__main__":
    main()
