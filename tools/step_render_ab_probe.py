"""Interleaved A/B: fused step_render (RGB565 pack riding the dye-advect
store) vs the composed step + separate render pass, at the headline config.

The single-shot probe (step_render_probe.py) measured each once; tunnel
throughput drifts within a session, so this one alternates A/B rounds and
reports per-round times plus the best of each — the decision metric for
which form ``step_render`` should default to at production scale.

  python tools/step_render_ab_probe.py [size] [rounds]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
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

    # compile both before timing
    jax.block_until_ready(fused(st, imp)[0].velocity)
    jax.block_until_ready(composed(st, imp)[0].velocity)

    tf, tc = [], []
    for r in range(rounds):
        tf.append(chain_time(lambda s: fused(s, imp)[0], st, n=15) * 1e3)
        tc.append(chain_time(lambda s: composed(s, imp)[0], st, n=15) * 1e3)
        print(f"round {r}: fused {tf[-1]:.3f} ms  composed {tc[-1]:.3f} ms",
              flush=True)
    bf, bc = min(tf), min(tc)
    print(f"best: fused {bf:.3f} ms ({1e3 / bf:.1f} FPS)  "
          f"composed {bc:.3f} ms ({1e3 / bc:.1f} FPS)  "
          f"winner={'fused' if bf <= bc else 'composed'}")


if __name__ == "__main__":
    main()
