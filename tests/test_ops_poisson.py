"""Unit + oracle-parity tests for the RB-SOR Poisson solver (poisson.cpp)."""

import numpy as np
import jax.numpy as jnp

from esp32_fluid_simulation_tpu.ops.poisson import (
    sor_solve, sor_sweep, jacobi_solve, poisson_residual, neighbor_count)
import oracle

F = np.float32
SHAPE = (9, 12)


def test_neighbor_count_structure():
    a = np.asarray(neighbor_count(SHAPE, jnp.int32))
    assert a[0, 0] == 2 and a[0, -1] == 2 and a[-1, 0] == 2 and a[-1, -1] == 2
    assert a[0, 5] == 3 and a[5, 0] == 3
    assert a[4, 6] == 4
    a3 = np.asarray(neighbor_count((4, 5, 6), jnp.int32))
    assert a3[0, 0, 0] == 3 and a3[2, 2, 3] == 6


def test_single_sweep_matches_oracle(rng):
    """One red-black sweep: the masked vectorized update must equal the
    sequential checkerboard traversal (same-color updates are order-free;
    the odd pass reads updated even cells)."""
    d = rng.standard_normal(SHAPE).astype(F)
    p0 = rng.standard_normal(SHAPE).astype(F)
    got = np.asarray(sor_sweep(jnp.asarray(p0), jnp.asarray(d), 1.96))
    want = oracle.sor_sweep(p0.copy(), d, 1.96)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_full_solve_matches_oracle(rng):
    d = rng.standard_normal(SHAPE).astype(F)
    got = np.asarray(sor_solve(jnp.asarray(d), 1.0, iters=10, omega=1.96))
    want = oracle.poisson_solve(d, 1.0, iters=10, omega=1.96)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_residual_decreases(rng):
    d = rng.standard_normal((24, 24)).astype(F)
    d = d - d.mean()  # compatible RHS for the pure-Neumann problem
    dj = jnp.asarray(d)
    norms = []
    p = jnp.zeros_like(dj)
    for _ in range(30):
        p = sor_sweep(p, dj, 1.7)
        r = poisson_residual(p, dj)
        norms.append(float(jnp.sqrt(jnp.mean(r * r))))
    assert norms[-1] < 0.06 * norms[0]
    assert norms[-1] < norms[10] < norms[0]


def test_converges_to_dense_solution(rng):
    """Many sweeps converge (up to the Neumann nullspace constant) to the
    dense solve of the exact 5-point system the LUT encodes
    (poisson.cpp:67-89): a_ii * p - sum(nbrs) = -dx*d."""
    h, w = 6, 7
    d = rng.standard_normal((h, w)).astype(F)
    d = d - d.mean()
    n = h * w
    A = np.zeros((n, n))
    a_ii = np.asarray(neighbor_count((h, w), jnp.int32))
    for i in range(h):
        for j in range(w):
            k = i * w + j
            A[k, k] = a_ii[i, j]
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < h and 0 <= jj < w:
                    A[k, ii * w + jj] = -1.0
    b = -d.reshape(-1).astype(np.float64)
    p_dense, *_ = np.linalg.lstsq(A, b, rcond=None)
    p_dense = p_dense.reshape(h, w)
    p = np.asarray(sor_solve(jnp.asarray(d), 1.0, iters=400, omega=1.7))
    np.testing.assert_allclose(p - p.mean(), p_dense - p_dense.mean(),
                               atol=1e-3)


def test_jacobi_converges(rng):
    d = rng.standard_normal((16, 16)).astype(F)
    d = d - d.mean()
    dj = jnp.asarray(d)
    p = jacobi_solve(dj, iters=600, omega=0.8)
    r = poisson_residual(p, dj)
    r0 = poisson_residual(jnp.zeros_like(dj), dj)
    assert float(jnp.max(jnp.abs(r))) < 0.02 * float(jnp.max(jnp.abs(r0)))


def test_3d_sor_runs_and_reduces_residual(rng):
    d = rng.standard_normal((8, 9, 10)).astype(F)
    d = d - d.mean()
    dj = jnp.asarray(d)
    p = sor_solve(dj, iters=30, omega=1.5)
    r = poisson_residual(p, dj)
    r0 = poisson_residual(jnp.zeros_like(dj), dj)
    assert float(jnp.sqrt(jnp.mean(r * r))) < 0.1 * float(
        jnp.sqrt(jnp.mean(r0 * r0)))


def test_sor_adaptive_hits_tolerance(rng):
    """Residual-targeted solve (VERDICT r4 next #9): early-exits at the
    requested on-device residual, in fewer sweeps than the cap."""
    from esp32_fluid_simulation_tpu.ops.poisson import sor_solve_adaptive
    d = rng.standard_normal((32, 48)).astype(F)
    d = d - d.mean()
    dj = jnp.asarray(d)
    tol = 2e-2
    p, iters, res = sor_solve_adaptive(dj, max_iters=400, omega=1.7,
                                       tol=tol, check_every=2)
    assert float(res) <= tol
    assert 0 < int(iters) < 400          # stopped early, not at the cap
    # matches the fixed solve at the same sweep count (allclose: XLA's FP
    # contraction differs between the while_loop body and unrolled sweeps)
    from esp32_fluid_simulation_tpu.ops.poisson import sor_solve
    np.testing.assert_allclose(
        np.asarray(p), np.asarray(sor_solve(dj, iters=int(iters), omega=1.7)),
        rtol=1e-4, atol=1e-4)


def test_sor_adaptive_cap_and_budget(rng):
    """tol=0 runs exactly to the cap and equals the fixed solve."""
    from esp32_fluid_simulation_tpu.ops.poisson import (sor_solve,
                                                        sor_solve_adaptive)
    d = jnp.asarray(rng.standard_normal((24, 24)).astype(F))
    p, iters, _ = sor_solve_adaptive(d, max_iters=10, omega=1.96, tol=0.0,
                                     check_every=3)   # 3 does not divide 10
    assert int(iters) == 10
    np.testing.assert_allclose(
        np.asarray(p), np.asarray(sor_solve(d, iters=10, omega=1.96)),
        rtol=1e-4, atol=1e-4)


def test_step_with_adaptive_solver(rng):
    """solver='sor_adaptive' through the full model step: physics stays
    close to fixed-sweep SOR at an equal budget."""
    from esp32_fluid_simulation_tpu import (SimConfig, Impulses, init_state,
                                            make_step)
    cfg_a = SimConfig(shape=(33, 41), solver="sor_adaptive", sor_iters=10,
                      sor_tol=1e-5)    # tight tol -> runs the full budget
    cfg_f = SimConfig(shape=(33, 41), solver="sor", sor_iters=10)
    imp = Impulses.from_lists(cfg_a, [(16, 20)], [(120.0, -60.0)])
    st_a = make_step(cfg_a, donate=False)(init_state(cfg_a), imp)
    st_f = make_step(cfg_f, donate=False)(init_state(cfg_f), imp)
    np.testing.assert_allclose(np.asarray(st_a.velocity),
                               np.asarray(st_f.velocity),
                               rtol=1e-4, atol=1e-4)
