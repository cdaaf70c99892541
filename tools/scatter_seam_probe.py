"""Why does the member-impulse scatter cost ~3.4 ms composed after the
pallas advect (tools/tiled_gap_probe.py: A=4.3 -> AB=7.7 ms) but only
~0.5 ms standalone?  Variants:

  scat(v)                 standalone (copy-on-write on the undonated input)
  scat(v + 0)             composed after a trivial elementwise producer
  adv(v) + 0              advect + trivial consumer (relayout cost?)
  scat(adv(v))            the production seam
  scat_flat(adv(v))       scatter on the flattened trailing dims
  per-ch scat(adv(v))     two 2D scatters instead of one 3D

  python tools/scatter_seam_probe.py [member_size] [n_members]
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
        tiled_ensemble_config, stack_impulses, _member_impulse_targets)
    from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas

    mcfg = SimConfig(shape=(msize, msize), scaling=1,
                     color_dtype="bfloat16")
    cfg, gh, gw = tiled_ensemble_config(mcfg, n_members)
    mh, mw = mcfg.shape
    H, W = cfg.shape
    imp = stack_impulses([scripted_swirl(mcfg, 7 * m)
                          for m in range(n_members)])
    rows, cols, vals = _member_impulse_targets(imp, gh, gw, mh, mw)

    st = init_state(cfg)

    def scat0(v):
        return v.at[:, rows, cols].set(vals.astype(v.dtype), mode="drop")

    step = jax.jit(lambda s: _step_tiled(s, None, cfg, apply_fn=scat0))
    for _ in range(20):
        st = step(st)
    sync(st)
    vel = st.velocity
    md = cfg.advect_max_disp

    def adv(v):
        return advect_pallas(v, v, cfg.dt, True, max_disp=md,
                             member=(mh, mw), self_advect=True)

    def scat(v):
        return v.at[:, rows, cols].set(vals.astype(v.dtype), mode="drop")

    def scat_flat(v):
        flat = v.reshape(2, H * W)
        lin = rows * W + cols
        lin = jnp.where(rows >= H, H * W, lin)   # keep OOB drop semantics
        out = flat.at[:, lin].set(vals.astype(v.dtype), mode="drop")
        return out.reshape(2, H, W)

    def scat_perch(v):
        v0 = v[0].at[rows, cols].set(vals[0].astype(v.dtype), mode="drop")
        v1 = v[1].at[rows, cols].set(vals[1].astype(v.dtype), mode="drop")
        return jnp.stack([v0, v1])

    for name, fn in [
        ("scat standalone", jax.jit(scat)),
        ("scat(v + 0)", jax.jit(lambda v: scat(v + 0))),
        ("adv(v) + 0", jax.jit(lambda v: adv(v) + 0)),
        ("adv alone", jax.jit(adv)),
        ("scat(adv(v))", jax.jit(lambda v: scat(adv(v)))),
        ("scat_flat(adv(v))", jax.jit(lambda v: scat_flat(adv(v)))),
        ("scat_perch(adv(v))", jax.jit(lambda v: scat_perch(adv(v)))),
        ("scat_flat standalone", jax.jit(scat_flat)),
    ]:
        print(f"{name:24s} {chain_ms(fn, vel):.2f} ms", flush=True)


if __name__ == "__main__":
    main()


def extra():
    """Variants isolating the pallas->scatter seam: explicit copy,
    optimization_barrier, and a where-overlay instead of scatter."""
    import functools
    from esp32_fluid_simulation_tpu import SimConfig
    from esp32_fluid_simulation_tpu.models.stable_fluids import init_state, _step_tiled
    from esp32_fluid_simulation_tpu.models.ensemble import (
        tiled_ensemble_config, stack_impulses, _member_impulse_targets)
    from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas

    mcfg = SimConfig(shape=(256, 256), scaling=1, color_dtype="bfloat16")
    cfg, gh, gw = tiled_ensemble_config(mcfg, 256)
    mh, mw = mcfg.shape
    H, W = cfg.shape
    imp = stack_impulses([scripted_swirl(mcfg, 7 * m) for m in range(256)])
    rows, cols, vals = _member_impulse_targets(imp, gh, gw, mh, mw)

    st = init_state(cfg)

    def scat(v):
        return v.at[:, rows, cols].set(vals.astype(v.dtype), mode="drop")

    step = jax.jit(lambda s: _step_tiled(s, None, cfg, apply_fn=scat))
    for _ in range(20):
        st = step(st)
    sync(st)
    vel = st.velocity
    md = cfg.advect_max_disp

    def adv(v):
        return advect_pallas(v, v, cfg.dt, True, max_disp=md,
                             member=(mh, mw), self_advect=True)

    # dense one-pass overlay: a [2, H, W] where() built from a scatter into
    # a tiny mask... actually compare-free: scatter bool mask + vals grids
    mask = jnp.zeros((H + 1, W), jnp.bool_).at[rows, cols].set(True, mode="drop")[:H]
    dense = jnp.zeros((2, H + 1, W), jnp.float32).at[:, rows, cols].set(vals, mode="drop")[:, :H]

    def overlay(v):
        return jnp.where(mask[None], dense.astype(v.dtype), v)

    for name, fn in [
        ("scat(copy(adv))", jax.jit(lambda v: scat(jnp.copy(adv(v))))),
        ("scat(barrier(adv))", jax.jit(lambda v: scat(jax.lax.optimization_barrier(adv(v))))),
        ("overlay(adv(v))", jax.jit(lambda v: overlay(adv(v)))),
        ("overlay standalone", jax.jit(overlay)),
        ("donated scat(adv)", jax.jit(lambda v: scat(adv(v)), donate_argnums=0)),
    ]:
        print(f"{name:24s} {chain_ms(fn, vel):.2f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("SEAM_EXTRA"):
    extra()
