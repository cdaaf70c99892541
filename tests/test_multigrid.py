"""Multigrid Poisson tests (BASELINE config 3)."""

import numpy as np
import jax.numpy as jnp

from esp32_fluid_simulation_tpu.ops.multigrid import (multigrid_solve,
                                                      _restrict, _prolong)
from esp32_fluid_simulation_tpu.ops.poisson import (sor_solve,
                                                    poisson_residual)

F = np.float32


def _rms(x):
    return float(jnp.sqrt(jnp.mean(x * x)))


def test_restrict_prolong_shapes(rng):
    x = jnp.asarray(rng.random((65, 97)).astype(F))
    c = _restrict(x)
    assert c.shape == (33, 49)
    f = _prolong(c, (65, 97))
    assert f.shape == (65, 97)
    # restriction of a constant is the constant; prolongation too
    one = jnp.ones((65, 97), F)
    np.testing.assert_allclose(np.asarray(_restrict(one)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(_prolong(_restrict(one), (65, 97))),
                               1.0, atol=1e-6)


def test_multigrid_beats_sor_at_equal_ish_work(rng):
    """2 V-cycles (~12 fine sweeps of work) must beat 10 plain SOR sweeps on
    a 128^2 grid, where SOR's fixed budget starts falling behind."""
    d = rng.standard_normal((128, 128)).astype(F)
    d = d - d.mean()
    dj = jnp.asarray(d)
    r0 = _rms(poisson_residual(jnp.zeros_like(dj), dj))
    p_sor = sor_solve(dj, iters=10, omega=1.96)
    p_mg = multigrid_solve(dj, cycles=2)
    r_sor = _rms(poisson_residual(p_sor, dj))
    r_mg = _rms(poisson_residual(p_mg, dj))
    assert r_mg < r_sor
    assert r_mg < 0.05 * r0


def test_multigrid_grid_independent_convergence(rng):
    """Residual reduction per V-cycle should not degrade much with size."""
    ratios = []
    for n in (32, 64, 128):
        d = rng.standard_normal((n, n)).astype(F)
        d = d - d.mean()
        dj = jnp.asarray(d)
        r0 = _rms(poisson_residual(jnp.zeros_like(dj), dj))
        p = multigrid_solve(dj, cycles=3)
        ratios.append(_rms(poisson_residual(p, dj)) / r0)
    assert all(r < 0.05 for r in ratios)
    assert ratios[-1] < 10 * ratios[0]  # no catastrophic size dependence


def test_multigrid_3d(rng):
    d = rng.standard_normal((32, 32, 32)).astype(F)
    d = d - d.mean()
    dj = jnp.asarray(d)
    r0 = _rms(poisson_residual(jnp.zeros_like(dj), dj))
    p = multigrid_solve(dj, cycles=3)
    assert _rms(poisson_residual(p, dj)) < 0.1 * r0


def test_multigrid_in_step():
    from esp32_fluid_simulation_tpu import (SimConfig, Impulses, init_state,
                                            make_step)
    cfg = SimConfig(shape=(64, 64), solver="multigrid", mg_cycles=2)
    fn = make_step(cfg, donate=False)
    st = fn(init_state(cfg),
            Impulses.from_lists(cfg, [(32, 32)], [(200.0, -100.0)]))
    assert bool(jnp.all(jnp.isfinite(st.velocity)))
