"""Full-step probe of the 'turbo' 4096^2 config: bf16 sampling for BOTH
advections (approximate source values, exact weights) on top of the
production kernels — the VERDICT r1 #4 '<10 ms full step' target.

  python tools/turbo_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from advect_probe import chain_ms  # noqa: E402


def step_ms(**kw):
    from esp32_fluid_simulation_tpu import (SimConfig, init_state, make_step,
                                            render_rgb565)
    from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl
    cfg = SimConfig(shape=(4096, 4096), solver="fused_pallas",
                    advect_impl="pallas", color_dtype="bfloat16",
                    scaling=1, **kw)
    st = init_state(cfg)
    fn = make_step(cfg, donate=False)
    imp = scripted_swirl(cfg, 0)

    def one(s):
        s = fn(s, imp)
        frame = render_rgb565(s.color, s=1)
        return s._replace(step=s.step + (frame[0, 0] > jnp.uint16(0)))

    return chain_ms(one, st, 10)


def main():
    res = {"backend": jax.default_backend()}
    res["step_ms_exact"] = step_ms()
    res["step_ms_turbo_bf16_sampling"] = step_ms(
        advect_sample_dtype="bfloat16")
    res["fps_exact"] = 1e3 / res["step_ms_exact"]
    res["fps_turbo"] = 1e3 / res["step_ms_turbo_bf16_sampling"]
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
