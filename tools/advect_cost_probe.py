"""Round-4 cost-structure probe for the panel advect kernel at 4096^2.

Separates three confounded costs by varying them independently:
  * slot machinery: max_disp (26 vs 10 slots) at FIXED low speed (occupancy
    constant) — measures the pl.when branch/unroll overhead per slot;
  * occupancy: field speed (10-cell vs 2.5-cell displacements) at fixed
    max_disp — measures the per-active-shift work;
  * gathers: pack (bf16 field) vs exact f32 at fixed everything else.

  python tools/advect_cost_probe.py
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


def swirl_velocity(h, w, speed):
    ii = np.arange(h, dtype=np.float32)[:, None] - h / 2
    jj = np.arange(w, dtype=np.float32)[None, :] - w / 2
    r = np.sqrt(ii * ii + jj * jj) + 1e-3
    mag = speed * np.exp(-((r - 0.3 * min(h, w)) ** 2)
                         / (0.1 * min(h, w)) ** 2)
    return jnp.asarray(np.stack([mag * (jj / r), -mag * (ii / r)]))


def main():
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    h = w = 4096
    dt = 1.0 / 30.0
    n = int(os.environ.get("N", "8"))
    res = {}
    vel_fast = swirl_velocity(h, w, 300.0)   # ~10-cell displacements
    vel_slow = swirl_velocity(h, w, 75.0)    # ~2.5-cell displacements

    for name, vel, md in [
        ("vel_md12_fast", vel_fast, 12),
        ("vel_md12_slow", vel_slow, 12),
        ("vel_md4_slow", vel_slow, 4),
        ("vel_md6_fast", vel_fast, 6),
    ]:
        fn = jax.jit(lambda v, md=md: advect_pallas(
            v, v, dt, True, max_disp=md, tile_h=64, tile_w=1024))
        res[name] = chain_ms(fn, vel, n)
        print(name, round(res[name], 3), flush=True)

    # bf16 pack path on the velocity field (exact for bf16 storage)
    vb = vel_fast.astype(jnp.bfloat16)
    fnb = jax.jit(lambda v: advect_pallas(
        v, v.astype(jnp.float32), dt, True, max_disp=12,
        tile_h=64, tile_w=1024))
    res["vel_md12_fast_bf16field"] = chain_ms(fnb, vb, n)
    print("vel_md12_fast_bf16field", round(res["vel_md12_fast_bf16field"], 3),
          flush=True)

    # sample_bf16 (round f32 in-window): the lossy 1-gather path
    fns = jax.jit(lambda v: advect_pallas(
        v, v, dt, True, max_disp=12, tile_h=64, tile_w=1024,
        sample_bf16=True))
    res["vel_md12_fast_samplebf16"] = chain_ms(fns, vel_fast, n)
    print("vel_md12_fast_samplebf16",
          round(res["vel_md12_fast_samplebf16"], 3), flush=True)

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
