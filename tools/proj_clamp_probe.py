"""A/B the clamped-window fused projection vs the padded path on silicon.

Checks bit-exactness (the clamp is a data-dependency-horizon argument, so
maxabs must be 0.0) and times both paths at the headline shape.

  python tools/proj_clamp_probe.py [size]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def chain_ms(fn, x0, n=10):
    r = fn(x0)
    jax.block_until_ready(r)
    t0 = time.time()
    jax.block_until_ready(fn(x0))
    t1 = time.time() - t0
    t0 = time.time()
    cur = x0
    for _ in range(n):
        cur = fn(cur)[0]
    jax.block_until_ready(cur)
    tn = time.time() - t0
    return max((tn - t1) / (n - 1), 1e-9) * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    import esp32_fluid_simulation_tpu.ops.pallas.project as P

    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.normal(size=(2, size, size)).astype(np.float32))

    clamped = jax.jit(lambda v: P.project_fused_pallas(v, 1.0, 10, 1.96))
    co, cp = clamped(vel)

    padded = jax.jit(lambda v: P.project_fused_pallas(v, 1.0, 10, 1.96,
                                                      clamped=False))
    po, pp = padded(vel)

    dv = float(jnp.max(jnp.abs(co - po)))
    dp = float(jnp.max(jnp.abs(cp - pp)))
    print(f"maxabs vel {dv} p {dp}")
    tc = chain_ms(clamped, vel)
    tp = chain_ms(padded, vel)
    print(f"clamped {tc:.3f} ms  padded {tp:.3f} ms  "
          f"saved {tp - tc:.3f} ms")
    assert dv == 0.0 and dp == 0.0, "clamped window is not bit-exact!"


if __name__ == "__main__":
    main()
