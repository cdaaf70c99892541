"""3D dye-bed sharded-vs-single-device parity on the 8-virtual-device CPU
mesh (VERDICT r4 next #7: the 2D-only guard in parallel.sharded lifted —
``make_sharded_step`` now dispatches 3D SimConfigs to
``parallel.sharded3d``, vertical axis local, horizontal axes sharded)."""

import numpy as np
import jax
import pytest

from esp32_fluid_simulation_tpu import (SimConfig, Impulses, init_state,
                                        make_step)
from esp32_fluid_simulation_tpu.parallel import (make_mesh, make_sharded_step,
                                                 sharded_state_sharding)

F = np.float32
MD = 6   # CFL clamp under the tests' impulse speeds; halo k=7 <= lw=12


def _mesh_2x4():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    return make_mesh(jax.devices()[:8], batch=1, grid_shape=(2, 4))


def _cfg(**kw):
    # (D, H, W) divisible by the (2, 4) horizontal mesh
    kw.setdefault("shape", (12, 32, 48))
    kw.setdefault("sor_iters", 4)
    kw.setdefault("omega", 1.7)
    return SimConfig(**kw)


def _drive(cfg, fn, st, imp, steps=3):
    for t in range(steps):
        st = fn(st, imp if t == 0 else Impulses.none(cfg))
    return st


def _imp(cfg):
    return Impulses.from_lists(
        cfg, [(6, 16, 24), (3, 8, 40)],
        [(40.0, 90.0, -45.0), (-30.0, -60.0, 120.0)])


def _parity(cfg, sharded_kw=None, steps=3, atol=1e-4, rtol=1e-4):
    # Bound note: the shard-window coordinate rebasing (si - ox + k) can
    # differ from the global-coordinate sample by 1 ulp and flip a floor()
    # cell, moving one trilinear stencil by a node — observed 3/55296
    # elements at ~5e-5 on the semilag config.  Decomposition-inherent
    # (same class as the 2D rk2 test's bound), not a halo bug.
    mesh = _mesh_2x4()
    imp = _imp(cfg)
    st = _drive(cfg, make_step(cfg, donate=False), init_state(cfg), imp,
                steps)
    st_sh = jax.device_put(init_state(cfg), sharded_state_sharding(cfg, mesh))
    fns = make_sharded_step(cfg, mesh, max_disp=MD, donate=False,
                            **(sharded_kw or {}))
    st_sh = _drive(cfg, fns, st_sh, imp, steps)
    np.testing.assert_allclose(np.asarray(st_sh.velocity),
                               np.asarray(st.velocity), rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(st_sh.color),
                               np.asarray(st.color), rtol=rtol, atol=atol)
    assert int(st_sh.step) == int(st.step)


def test_sharded3d_step_matches_single_device():
    _parity(_cfg())


def test_sharded3d_sor_halo_depths_exact():
    """Trapezoidal SOR halos (fewer collectives, redundant ring compute)
    must match the per-half-sweep exchange bit-closely in 3D too."""
    cfg = _cfg()
    mesh = _mesh_2x4()
    imp = _imp(cfg)
    sh = sharded_state_sharding(cfg, mesh)
    st = jax.device_put(
        _drive(cfg, make_step(cfg, donate=False), init_state(cfg), imp, 2),
        sh)
    base = make_sharded_step(cfg, mesh, max_disp=MD, donate=False,
                             sor_halo=1)(st, imp)
    wide = make_sharded_step(cfg, mesh, max_disp=MD, donate=False,
                             sor_halo=5)(st, imp)
    np.testing.assert_allclose(np.asarray(wide.velocity),
                               np.asarray(base.velocity),
                               rtol=2e-6, atol=2e-6)


def test_sharded3d_rk2_matches_single_device():
    # same loose bound as the 2D rk2 test: the sampled-velocity second
    # backtrace can flip a floor() cell from 1-ulp coordinate rebasing
    _parity(_cfg(advector="rk2"), atol=5e-4, rtol=1e-3)


def test_sharded3d_maccormack_matches_single_device():
    _parity(_cfg(advector="maccormack"), atol=1e-4, rtol=1e-4)


def test_sharded3d_jacobi_matches_single_device():
    _parity(_cfg(solver="jacobi", sor_iters=12, omega=0.9))


def test_sharded3d_multigrid_matches_single_device():
    _parity(_cfg(shape=(16, 32, 64), solver="multigrid", mg_cycles=2),
            atol=1e-4, rtol=1e-4)


def test_sharded3d_vorticity_matches_single_device():
    # 3D vorticity confinement rides the same step order as 2D
    _parity(_cfg(vorticity_eps=2.0), atol=1e-4, rtol=1e-4)


def test_sharded3d_metrics_match_single_device():
    from esp32_fluid_simulation_tpu.models.stable_fluids import (
        make_step_with_metrics)
    from esp32_fluid_simulation_tpu.parallel import (
        make_sharded_step_with_metrics)
    cfg = _cfg()
    mesh = _mesh_2x4()
    imp = _imp(cfg)
    st = init_state(cfg)
    _, want = make_step_with_metrics(cfg, donate=False)(st, imp)
    st_sh = jax.device_put(init_state(cfg), sharded_state_sharding(cfg, mesh))
    _, got = make_sharded_step_with_metrics(cfg, mesh, max_disp=MD,
                                            donate=False)(st_sh, imp)
    assert bool(got["finite"]) and bool(want["finite"])
    for key in ("div_pre_max", "div_post_max", "poisson_residual_l2",
                "max_speed"):
        np.testing.assert_allclose(float(got[key]), float(want[key]),
                                   rtol=1e-4, atol=1e-5)


def test_sharded3d_kernel_paths_match_jnp(monkeypatch):
    """advect_impl='pallas' (3D gather kernel block mode) and
    solver='sor_pallas' (packed-RB 3D chunk) under shard_map match the
    jnp sharded step, interpret-mode Mosaic on the CPU mesh."""
    import functools
    from jax.experimental import pallas as pl
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    mesh = _mesh_2x4()
    ref = _cfg(advect_impl="jnp", solver="sor", sor_iters=3)
    kcfg = _cfg(advect_impl="pallas", solver="sor_pallas", sor_iters=3,
                advect_max_disp=MD)
    imp = _imp(ref)
    st_r = jax.device_put(init_state(ref), sharded_state_sharding(ref, mesh))
    st_k = jax.device_put(init_state(kcfg),
                          sharded_state_sharding(kcfg, mesh))
    fn_r = make_sharded_step(ref, mesh, max_disp=MD, donate=False)
    fn_k = make_sharded_step(kcfg, mesh, max_disp=MD, donate=False)
    for t in range(2):
        im = imp if t == 0 else Impulses.none(ref)
        st_r = fn_r(st_r, im)
        st_k = fn_k(st_k, im)
    np.testing.assert_allclose(np.asarray(st_k.velocity),
                               np.asarray(st_r.velocity),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_k.color),
                               np.asarray(st_r.color),
                               rtol=1e-4, atol=1e-4)


def test_sharded3d_rejects_unsupported():
    mesh = _mesh_2x4()
    with pytest.raises(NotImplementedError, match="fused"):
        make_sharded_step(_cfg(solver="fused_pallas"), mesh)
