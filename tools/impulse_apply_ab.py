"""Interleaved A/B of the two member-impulse application forms inside the
whole tiled step (round 5): direct scatter-on-vel (XLA wraps it in two
full-grid relayout copies between the Pallas kernels) vs the mask+dense
where-overlay (relayout-free, bit-identical).  Interleaved best-of-N to
defeat the tunnel's run-to-run timing swings.

  python tools/impulse_apply_ab.py [member_size] [n_members] [reps]
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., :1, :1]))


def chain_ms(fn, x0, n=8):
    t0 = time.time()
    cur = x0
    for _ in range(n):
        cur = fn(cur)
    sync(cur)
    return (time.time() - t0) / n * 1e3


def main():
    msize = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_members = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    from esp32_fluid_simulation_tpu import SimConfig
    from esp32_fluid_simulation_tpu.models.stable_fluids import (
        init_state, _step_tiled)
    from esp32_fluid_simulation_tpu.models.ensemble import (
        tiled_ensemble_config, stack_impulses, _member_impulse_targets,
        _apply_member_impulses)
    from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl

    mcfg = SimConfig(shape=(msize, msize), scaling=1,
                     color_dtype="bfloat16")
    cfg, gh, gw = tiled_ensemble_config(mcfg, n_members)
    mh, mw = mcfg.shape
    imp = stack_impulses([scripted_swirl(mcfg, 7 * m)
                          for m in range(n_members)])
    rows, cols, vals = _member_impulse_targets(imp, gh, gw, mh, mw)

    def apply_scatter(v):
        return v.at[:, rows, cols].set(vals.astype(v.dtype), mode="drop")

    apply_overlay = functools.partial(_apply_member_impulses, imp=imp,
                                      gh=gh, gw=gw, mh=mh, mw=mw)

    step_s = jax.jit(lambda s: _step_tiled(s, None, cfg,
                                           apply_fn=apply_scatter))
    step_o = jax.jit(lambda s: _step_tiled(s, None, cfg,
                                           apply_fn=apply_overlay))

    st = init_state(cfg)
    for _ in range(30):
        st = step_o(st)
    sync(st)
    # parity: one step through each must be bit-identical
    a, b = step_s(st), step_o(st)
    import numpy as np
    np.testing.assert_array_equal(np.asarray(a.velocity),
                                  np.asarray(b.velocity))
    print("parity: scatter == overlay bit-exact", flush=True)

    best_s, best_o = [], []
    for r in range(reps):
        best_s.append(chain_ms(step_s, st))
        best_o.append(chain_ms(step_o, st))
        print(f"rep {r}: scatter {best_s[-1]:.2f} ms   "
              f"overlay {best_o[-1]:.2f} ms", flush=True)
    print(f"best: scatter {min(best_s):.2f} ms  overlay {min(best_o):.2f} ms"
          f"  ({1e3/min(best_s):.1f} vs {1e3/min(best_o):.1f} steps/s)",
          flush=True)


if __name__ == "__main__":
    main()
