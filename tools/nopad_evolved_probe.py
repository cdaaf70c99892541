"""A/B the clamped-patchwork (nopad) sloop advect vs the DUS-padded path
on an EVOLVED production state (30 forced steps at 4096^2) — the honest
occupancy the headline step sees, unlike nopad_ab_probe's worst-case
random field.

  python tools/nopad_evolved_probe.py [size]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from esp32_fluid_simulation_tpu import SimConfig, init_state, make_step
    from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    from esp32_fluid_simulation_tpu.utils.profiling import chain_time

    cfg = SimConfig(shape=(size, size), scaling=1, solver="fused_pallas",
                    advect_impl="pallas", color_dtype="bfloat16")
    st = init_state(cfg)
    fn = make_step(cfg, donate=False)
    for t in range(30):
        st = fn(st, scripted_swirl(cfg, t))
    jax.block_until_ready(st.velocity)
    print("state evolved", flush=True)

    vel, dye = st.velocity, st.color
    md = cfg.advect_max_disp

    for name, make in [
        ("vel_f32_2ch", lambda np_: jax.jit(lambda v: advect_pallas(
            v, v, cfg.dt, True, max_disp=md, nopad=np_))),
        ("dye_bf16_3ch", lambda np_: jax.jit(lambda f: advect_pallas(
            f, vel, cfg.dt, False, max_disp=md, clip01=True, nopad=np_))),
    ]:
        field = vel if name.startswith("vel") else dye
        pad_fn, nopad_fn = make(False), make(True)
        a, b = pad_fn(field), nopad_fn(field)
        exact = bool(jnp.all(a == b))
        ta = chain_time(pad_fn, field, n=30)
        tb = chain_time(nopad_fn, field, n=30)
        print(f"{name}: bit_exact={exact}  pad={ta*1e3:.3f} ms  "
              f"nopad={tb*1e3:.3f} ms  ({ta/tb:.2f}x)", flush=True)
        assert exact


if __name__ == "__main__":
    main()
