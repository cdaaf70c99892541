"""Sharded tiled-domain supergrid (BASELINE config 4 past one chip):
parity vs the single-device tiled step on the 8-virtual-device CPU mesh.

Because each shard owns whole member tiles, member walls never cross shard
boundaries — the sharded step must be numerically identical (not just
allclose-after-collectives) to the single-device supergrid step, member
scatter included."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esp32_fluid_simulation_tpu import SimConfig, Impulses, init_state
from esp32_fluid_simulation_tpu.models.stable_fluids import step
from esp32_fluid_simulation_tpu.models.ensemble import (
    init_ensemble, make_ensemble_step, stack_impulses)
from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl
from esp32_fluid_simulation_tpu.parallel import (
    make_mesh, make_sharded_tiled_step, make_sharded_ensemble_step,
    sharded_state_sharding)


def _mesh_2x4():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    return make_mesh(jax.devices()[:8], batch=1, grid_shape=(2, 4))


def _interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


@pytest.mark.parametrize("solver", ["sor", "fused_pallas"])
def test_sharded_tiled_matches_single_device(monkeypatch, solver):
    if solver == "fused_pallas":
        _interpret_pallas(monkeypatch)
    mesh = _mesh_2x4()
    # (2, 4) mesh -> shard blocks (64, 64) = 2x2 member tiles of (32, 32)
    cfg = SimConfig(shape=(128, 256), domain_tile=(32, 32), solver=solver,
                    sor_iters=3,
                    advect_impl="pallas" if solver == "fused_pallas"
                    else "auto",
                    advect_max_disp=8)
    st = init_state(cfg)
    # impulses in several member tiles, including a duplicate position
    # (last-wins) and one on a shard boundary column
    imp = Impulses.from_lists(
        cfg,
        [(5, 5), (5, 5), (40, 70), (100, 200), (33, 64)],
        [(50.0, 80.0), (-90.0, 30.0), (60.0, -60.0), (10.0, 120.0),
         (75.0, 75.0)])

    single = st
    for _ in range(2):
        single = jax.jit(functools.partial(step, cfg=cfg))(single, imp)

    st_sh = jax.device_put(st, sharded_state_sharding(cfg, mesh))
    fn = make_sharded_tiled_step(cfg, mesh, donate=False)
    out = st_sh
    for _ in range(2):
        out = fn(out, imp)

    # jnp path is bit-comparable; the kernel path re-tiles the SOR chunks
    # to the shard block shape, so sums reassociate (same tolerance as
    # test_sharded_kernel_solvers_match_single_device)
    tol = dict(rtol=1e-5, atol=1e-5) if solver == "sor" else \
        dict(rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.velocity),
                               np.asarray(single.velocity), **tol)
    np.testing.assert_allclose(np.asarray(out.color),
                               np.asarray(single.color), **tol)
    assert int(out.step) == int(single.step)


def test_sharded_ensemble_matches_single_device():
    mesh = _mesh_2x4()
    n = 32   # 4x8 member grid: x-factor 2 divides 4, y-factor 4 divides 8
    member = SimConfig(shape=(32, 32), sor_iters=3)
    state = init_ensemble(member, n)
    imps = stack_impulses([scripted_swirl(member, 7 * m) for m in range(n)])

    single_fn = make_ensemble_step(member, donate=False, mode="tiled")
    single = single_fn(state, imps)

    fn, cfg_super = make_sharded_ensemble_step(member, mesh, n, donate=False)
    out = fn(state, imps)

    np.testing.assert_allclose(np.asarray(out.velocity),
                               np.asarray(single.velocity),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.color),
                               np.asarray(single.color),
                               rtol=1e-5, atol=1e-5)


def test_sharded_tiled_rejects_misaligned_mesh():
    mesh = _mesh_2x4()
    # 3x3 member grid of 32^2 tiles: the (2, 4) mesh can't own whole tiles
    cfg = SimConfig(shape=(96, 96), domain_tile=(32, 32))
    with pytest.raises(ValueError, match="whole member tiles"):
        make_sharded_tiled_step(cfg, mesh)


def test_plain_sharded_step_refuses_domain_tile():
    """ADVICE r3: running a tiled config as a plain single-domain sharded
    step would silently drop member-wall BCs — it must refuse."""
    from esp32_fluid_simulation_tpu.parallel import make_sharded_step
    mesh = _mesh_2x4()
    cfg = SimConfig(shape=(128, 256), domain_tile=(32, 32))
    with pytest.raises(NotImplementedError, match="domain_tile"):
        make_sharded_step(cfg, mesh)


def test_ensemble_auto_vmap_guard():
    """VERDICT r3 #7: mode='auto' falling back to vmap for >=64 members
    must raise (the vmapped batch is ~100x slower at that scale) unless
    mode='vmap' is explicit."""
    cfg = SimConfig(shape=(64, 64), vorticity_eps=2.0)   # not tile-compatible
    state = init_ensemble(cfg, 64)
    imps = stack_impulses([scripted_swirl(cfg, m) for m in range(64)])
    with pytest.raises(ValueError, match="vmap ensemble path"):
        make_ensemble_step(cfg, donate=False)(state, imps)
    # explicit opt-in still works
    out = make_ensemble_step(cfg, donate=False, mode="vmap")(state, imps)
    assert np.all(np.isfinite(np.asarray(out.velocity)))
    # small ensembles stay quiet under auto
    small = jax.tree_util.tree_map(lambda x: x[:4], state)
    simp = jax.tree_util.tree_map(lambda x: x[:4], imps)
    out2 = make_ensemble_step(cfg, donate=False)(small, simp)
    assert np.all(np.isfinite(np.asarray(out2.velocity)))
