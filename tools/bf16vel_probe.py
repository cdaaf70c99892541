"""bf16-velocity accuracy + speed probe (VERDICT r3 #8).

Runs the production kernel step twice — velocity stored f32 vs bfloat16 —
from the same initial state with the same swirl forcing, and reports the
trajectory divergence after N steps plus the per-step time of each.

  python tools/bf16vel_probe.py [size] [steps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    from esp32_fluid_simulation_tpu import SimConfig, init_state, make_step
    from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl

    kw = dict(shape=(size, size), scaling=1, solver="fused_pallas",
              advect_impl="pallas", color_dtype="bfloat16")
    cfg_f = SimConfig(**kw)
    cfg_b = SimConfig(**kw, dtype="bfloat16")

    res = {"size": size, "steps": steps}
    states = {}
    for name, cfg in (("f32", cfg_f), ("bf16", cfg_b)):
        st = init_state(cfg)
        fn = make_step(cfg, donate=False)
        imps = [scripted_swirl(cfg, t) for t in range(steps)]
        st = fn(st, imps[0])
        jnp.sum(st.velocity[..., :1, :1]).block_until_ready()
        t0 = time.time()
        for t in range(1, steps):
            st = fn(st, imps[t])
        float(jnp.sum(st.velocity[..., :1, :1]))
        res[f"ms_per_step_{name}"] = (time.time() - t0) / (steps - 1) * 1e3
        states[name] = st
        print(name, round(res[f"ms_per_step_{name}"], 3), flush=True)

    vf = np.asarray(states["f32"].velocity, np.float32)
    vb = np.asarray(states["bf16"].velocity, np.float32)
    cf = np.asarray(states["f32"].color, np.float32)
    cb = np.asarray(states["bf16"].color, np.float32)
    vscale = float(np.sqrt(np.mean(vf * vf))) or 1.0
    res["vel_rms_rel_delta"] = float(
        np.sqrt(np.mean((vf - vb) ** 2))) / vscale
    res["vel_max_abs_delta"] = float(np.max(np.abs(vf - vb)))
    res["vel_max_abs"] = float(np.max(np.abs(vf)))
    res["color_rms_delta"] = float(np.sqrt(np.mean((cf - cb) ** 2)))
    res["color_max_abs_delta"] = float(np.max(np.abs(cf - cb)))
    print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
