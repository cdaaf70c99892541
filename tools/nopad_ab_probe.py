"""A/B the nopad (patchwork-window) sloop advect vs the DUS-padded path.

Uses the REAL `advect_pallas` with the `nopad` override, at the headline
4096^2 shapes: f32 velocity self-advect (2ch) and bf16 dye (3ch).
Asserts bit-exactness, then reports chain_time for both.

Run: python tools/nopad_ab_probe.py [H W]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas  # noqa: E402
from esp32_fluid_simulation_tpu.utils.profiling import chain_time  # noqa: E402


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    dt = 1 / 60
    key = jax.random.PRNGKey(0)
    kv, kc = jax.random.split(key)
    vel = (jax.random.normal(kv, (2, h, w), jnp.float32) * 300.0)
    dye = jax.random.uniform(kc, (3, h, w)).astype(jnp.bfloat16)

    for name, field, ns, kw in [
        ("vel_f32_2ch", vel, True, {}),
        ("dye_bf16_3ch", dye, False, dict(clip01=True)),
    ]:
        self_adv = field.shape[0] == 2

        def mk(np_):
            if self_adv:
                return jax.jit(lambda v: advect_pallas(
                    v, v, dt, True, nopad=np_))
            return jax.jit(lambda fl: advect_pallas(
                fl, vel, dt, ns, nopad=np_, **kw))

        fns = {"pad": mk(False), "nopad": mk(True)}
        a = fns["pad"](field)
        b = fns["nopad"](field)
        exact = bool(jnp.all(a == b))
        ta = chain_time(fns["pad"], field, n=30)
        tb = chain_time(fns["nopad"], field, n=30)
        print(f"{name}: bit_exact={exact}  pad={ta*1e3:.3f} ms  "
              f"nopad={tb*1e3:.3f} ms  ({ta/tb:.2f}x)")
        assert exact, f"{name}: nopad output differs from padded path"


if __name__ == "__main__":
    main()
