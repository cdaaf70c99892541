"""Unit + oracle-parity tests for divergence / gradient ops (finitediff.cpp)."""

import numpy as np
import jax.numpy as jnp

from esp32_fluid_simulation_tpu.ops.fd import (divergence, subtract_gradient,
                                               curl2d, vorticity_confinement)
import oracle

F = np.float32
SHAPE = (11, 14)


def test_divergence_of_gradient_field_analytic():
    """v = (x, y) has divergence 2/ (2dx)*2 = ... central diff of identity
    field gives exactly 1 per axis in the interior."""
    h, w = SHAPE
    v = np.zeros((2, h, w), F)
    v[0] = np.arange(h, dtype=F)[:, None]
    v[1] = np.arange(w, dtype=F)[None, :]
    d = np.asarray(divergence(jnp.asarray(v), dx=1.0))
    np.testing.assert_allclose(d[1:-1, 1:-1], 2.0, atol=1e-6)


def test_divergence_matches_oracle(rng):
    v = (3 * rng.standard_normal((2,) + SHAPE)).astype(F)
    got = np.asarray(divergence(jnp.asarray(v), dx=1.0))
    want = oracle.divergence(np.moveaxis(v, 0, -1), dx=1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_reflected_ghost_boundary():
    """At the wall the ghost neighbor contributes -v of the center cell
    (finitediff.cpp:17-20): uniform v has div = v at the low wall."""
    h, w = SHAPE
    v = np.zeros((2, h, w), F)
    v[0] = 4.0
    d = np.asarray(divergence(jnp.asarray(v), dx=1.0))
    # row 0: (v[1].x - (-v[0].x)) / 2 = (4+4)/2 = 4; interior rows cancel
    np.testing.assert_allclose(d[0, 1:-1], 4.0, atol=1e-6)
    np.testing.assert_allclose(d[-1, 1:-1], -4.0, atol=1e-6)
    np.testing.assert_allclose(d[1:-1, 1:-1], 0.0, atol=1e-6)


def test_subtract_gradient_matches_oracle(rng):
    v = (2 * rng.standard_normal((2,) + SHAPE)).astype(F)
    p = rng.standard_normal(SHAPE).astype(F)
    got = np.asarray(subtract_gradient(jnp.asarray(v), jnp.asarray(p), 1.0))
    want = oracle.subtract_gradient(np.moveaxis(v, 0, -1), p, 1.0)
    np.testing.assert_allclose(got, np.moveaxis(want, -1, 0),
                               rtol=1e-6, atol=1e-6)


def test_gradient_of_linear_pressure():
    """p = 2*i + 3*j: interior grad = (2, 3); edges use one-sided clamp."""
    h, w = SHAPE
    p = (2 * np.arange(h, dtype=F)[:, None]
         + 3 * np.arange(w, dtype=F)[None, :])
    v = np.zeros((2, h, w), F)
    out = np.asarray(subtract_gradient(jnp.asarray(v), jnp.asarray(p), 1.0))
    np.testing.assert_allclose(out[0, 1:-1, 1:-1], -2.0, atol=1e-5)
    np.testing.assert_allclose(out[1, 1:-1, 1:-1], -3.0, atol=1e-5)


def test_3d_divergence_and_gradient(rng):
    shape = (5, 6, 7)
    v = rng.standard_normal((3,) + shape).astype(F)
    d = divergence(jnp.asarray(v))
    assert d.shape == shape
    p = rng.standard_normal(shape).astype(F)
    out = subtract_gradient(jnp.asarray(v), jnp.asarray(p))
    assert out.shape == (3,) + shape
    # divergence of v = (x,y,z) is 3
    lin = np.zeros((3,) + shape, F)
    for k in range(3):
        idx = np.arange(shape[k], dtype=F)
        lin[k] = idx.reshape([-1 if a == k else 1 for a in range(3)])
    d3 = np.asarray(divergence(jnp.asarray(lin)))
    np.testing.assert_allclose(d3[1:-1, 1:-1, 1:-1], 3.0, atol=1e-5)


def test_curl_and_vorticity_confinement(rng):
    h, w = SHAPE
    # rigid rotation: v0 = -(j-cj), v1 = (i-ci) has curl
    # d(v1)/d0 - d(v0)/d1 = 1 - (-1) = 2 in the interior
    ci, cj = h / 2, w / 2
    v = np.zeros((2, h, w), F)
    v[0] = -(np.arange(w, dtype=F)[None, :] - cj)
    v[1] = np.broadcast_to(np.arange(h, dtype=F)[:, None] - ci, (h, w))
    w_curl = np.asarray(curl2d(jnp.asarray(v)))
    np.testing.assert_allclose(w_curl[1:-1, 1:-1], 2.0, atol=1e-5)
    # confinement leaves a zero-vorticity field untouched
    vconst = np.full((2, h, w), 1.5, F)
    out = np.asarray(vorticity_confinement(jnp.asarray(vconst), 5.0, 1 / 30))
    np.testing.assert_allclose(out, vconst, atol=1e-5)
