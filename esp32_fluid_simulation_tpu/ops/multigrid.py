"""Geometric multigrid for the pressure Poisson equation (BASELINE config 3).

New capability — the reference stops at 10 fixed SOR sweeps (``.ino:275``),
whose error reduction degrades as O(grid size) at scale; multigrid keeps the
work O(N) with grid-independent convergence.  Built from the same masked
checkerboard sweep as ``poisson.sor_sweep`` (SURVEY.md §7.5: "multigrid built
from the same sweep kernel at multiple resolutions").

Discretization bookkeeping: all levels solve the reference's *unit-stencil*
system ``nbr_sum(p) - a_ii*p = b`` (``poisson.cpp:63-90``; on the finest
level ``b = dx*d``).  The unit stencil at spacing 2h equals 4x the one at h,
so the restricted residual is scaled by 4 when descending.

Coarsening is 2x2 block averaging (shape-agnostic aggregation), prolongation
is piecewise-constant injection — simple, rank-polymorphic (2D/3D), and
convergence-tested against the dense solve in tests/test_multigrid.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .poisson import (sor_sweep, neighbor_sum, neighbor_count, _neg_inv_diag,
                      _parity)


def _restrict(x: jax.Array) -> jax.Array:
    """Average non-overlapping 2^nd blocks (edge-padded to even sizes)."""
    nd = x.ndim
    pads = [(0, s % 2) for s in x.shape]
    if any(p[1] for p in pads):
        x = jnp.pad(x, pads, mode="edge")
    for axis in range(nd):
        n = x.shape[axis]
        shape = x.shape[:axis] + (n // 2, 2) + x.shape[axis + 1:]
        x = x.reshape(shape).mean(axis=axis + 1)
    return x


def _prolong(x: jax.Array, fine_shape) -> jax.Array:
    """Linear (cell-centered) prolongation back to ``fine_shape``.

    Piecewise-constant injection stalls here: for a 2nd-order operator the
    interpolation orders must satisfy m_P + m_R > 2, and averaging R already
    contributes only 1.  Cell-centered linear interp per axis: fine node 2c
    blends (3/4)x[c] + (1/4)x[c-1], node 2c+1 blends (3/4)x[c] + (1/4)x[c+1]
    (edge-clamped).
    """
    for axis in range(x.ndim):
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
             jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
            axis=axis)
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
             jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                                  axis=axis)],
            axis=axis)
        even = 0.75 * x + 0.25 * lo
        odd = 0.75 * x + 0.25 * hi
        inter = jnp.stack([even, odd], axis=axis + 1)
        x = inter.reshape(x.shape[:axis] + (2 * x.shape[axis],)
                          + x.shape[axis + 1:])
    return x[tuple(slice(0, s) for s in fine_shape)]


def _residual_unit(p, b):
    a = neighbor_count(p.shape, p.dtype)
    return neighbor_sum(p) - a * p - b


def _coarse_shapes(shape, levels):
    shapes = [tuple(shape)]
    while len(shapes) < levels and min(shapes[-1]) > 3:
        shapes.append(tuple(-(-s // 2) for s in shapes[-1]))
    return shapes


def _vcycle(p, b, shapes, level, omega, n_pre, n_post, n_coarse):
    shape = shapes[level]
    neg_inv = _neg_inv_diag(shape, p.dtype)
    parity = _parity(shape)
    for _ in range(n_pre):
        p = sor_sweep(p, b, omega, 1.0, neg_inv, parity)
    if level + 1 < len(shapes):
        # error equation: L(e) = -r (r = L(p) - b); the unit stencil at 2h
        # is 4x the one at h, hence the factor.
        r = _residual_unit(p, b)
        b_c = -4.0 * _restrict(r)
        e_c = jnp.zeros(shapes[level + 1], p.dtype)
        e_c = _vcycle(e_c, b_c, shapes, level + 1, omega,
                      n_pre, n_post, n_coarse)
        p = p + _prolong(e_c, shape)
        for _ in range(n_post):
            p = sor_sweep(p, b, omega, 1.0, neg_inv, parity)
    else:
        for _ in range(n_coarse):
            p = sor_sweep(p, b, omega, 1.0, neg_inv, parity)
    return p


def multigrid_solve(d: jax.Array, dx: float = 1.0, cycles: int = 2,
                    levels: int = 0, omega: float = 1.3,
                    n_pre: int = 2, n_post: int = 2,
                    n_coarse: int = 16,
                    p0: jax.Array | None = None) -> jax.Array:
    """Solve the reference system (``poisson.cpp:114-125`` semantics, zero
    init) with V-cycles.  ``levels=0`` coarsens until min(shape) <= 3.
    ``omega`` here is the *smoother* relaxation (over-relaxing a smoother
    hurts; values near 1-1.3 are right, independent of the SOR-solver 1.96).
    """
    omega = min(omega, 1.3)
    if levels <= 0:
        levels = 32
    shapes = _coarse_shapes(d.shape, levels)
    b = jnp.asarray(dx, d.dtype) * d
    p = jnp.zeros_like(d) if p0 is None else p0
    for _ in range(cycles):
        p = _vcycle(p, b, shapes, 0, omega, n_pre, n_post, n_coarse)
    return p
