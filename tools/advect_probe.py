"""Probe the advection kernel on real hardware with a bench-realistic
velocity field (swirl, |v| up to ~300 cells/s, dt=1/30 -> ~10-cell
displacements).  Prints one JSON line per variant.

  python tools/advect_probe.py [--size 4096] [--n 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf[..., :1, :1]))


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


def swirl_velocity(h, w, speed=300.0):
    ii = np.arange(h, dtype=np.float32)[:, None] - h / 2
    jj = np.arange(w, dtype=np.float32)[None, :] - w / 2
    r = np.sqrt(ii * ii + jj * jj) + 1e-3
    mag = speed * np.exp(-((r - 0.3 * min(h, w)) ** 2) / (0.1 * min(h, w)) ** 2)
    vi = mag * (jj / r)
    vj = -mag * (ii / r)
    return jnp.asarray(np.stack([vi, vj]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--max-disp", type=int, default=12)
    ap.add_argument("--variant", default="tilewide")
    ap.add_argument("--tile-w", type=int, default=1024)
    ap.add_argument("--tile-h", type=int, default=128)
    ap.add_argument("--ab", action="store_true")
    args = ap.parse_args()
    h = w = args.size
    dt = 1.0 / 30.0

    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas

    vel = swirl_velocity(h, w)
    dye_f32 = jnp.asarray(np.random.default_rng(0).random((3, h, w)),
                          jnp.float32)
    dye_bf16 = dye_f32.astype(jnp.bfloat16)

    res = {"backend": jax.default_backend(), "size": args.size,
           "variant": args.variant}
    kw = dict(max_disp=args.max_disp, variant=args.variant,
              tile_w=args.tile_w, tile_h=args.tile_h)

    fn3 = jax.jit(lambda d: advect_pallas(d, vel, dt, False, **kw))
    res["advect_3ch_f32_ms"] = chain_ms(fn3, dye_f32, args.n)
    res["advect_3ch_bf16_ms"] = chain_ms(fn3, dye_bf16, args.n)

    fn2 = jax.jit(lambda v: advect_pallas(v, v, dt, True, **kw))
    res["advect_vel_2ch_f32_ms"] = chain_ms(fn2, vel, args.n)

    if args.ab:
        # numerics A/B vs the round-1 tilewide kernel, on device
        ref = jax.jit(lambda d: advect_pallas(
            d, vel, dt, False, max_disp=args.max_disp, variant="tilewide"))
        a = np.asarray(fn3(dye_f32))
        b = np.asarray(ref(dye_f32))
        res["ab_f32_maxabs"] = float(np.max(np.abs(a - b)))
        ab = np.asarray(fn3(dye_bf16)).astype(np.float32)
        bb = np.asarray(ref(dye_bf16)).astype(np.float32)
        res["ab_bf16_bitexact"] = bool(np.array_equal(ab, bb))
        refns = jax.jit(lambda v: advect_pallas(
            v, v, dt, True, max_disp=args.max_disp, variant="tilewide"))
        an = np.asarray(fn2(vel))
        bn = np.asarray(refns(vel))
        res["ab_noslip_maxabs"] = float(np.max(np.abs(an - bn)))

    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
