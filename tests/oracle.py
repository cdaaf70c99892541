"""NumPy oracle: a faithful float32 transliteration of the reference C++
kernels (advect.h, finitediff.cpp, poisson.cpp, .ino init/loop), used as the
golden arbiter for parity tests (SURVEY.md §4.2).

As a transliteration this file is a derived work of the MIT-licensed
reference (© 2021, 2023, 2025 colonelwatch) — see LICENSE (NOTICE section)
at the repo root for the attribution.

Conventions: arrays are indexed ``arr[i, j]`` where ``i`` is the reference's
fast axis bounded by ``dim_x = N_ROWS`` and ``j`` bounded by ``dim_y =
N_COLS`` (``operations.h:7-9``).  Vector fields carry a trailing channel
axis: ``vel[i, j, 0]`` is the reference's ``v.x`` (along i), ``vel[i, j, 1]``
is ``v.y`` (along j).  Dye is unit-scale float32 — UQ32 quantization error
(2^-33) is below float32 epsilon, so it is omitted (see utils/uq32.py).

Deliberately loop-based and slow: clarity and faithfulness over speed.
"""

import numpy as np

F = np.float32


def lerp(t, a, b):
    # advect.h:14-16
    return a * (F(1) - t) + b * t


def bilinear(di, dj, p11, p12, p21, p22):
    # advect.h:18-22
    return lerp(di, lerp(dj, p11, p12), lerp(dj, p21, p22))


def sample(p, i, j, no_slip):
    """advect.h:24-72 (dim_x = p.shape[0] bounds i)."""
    dim_x, dim_y = p.shape[0], p.shape[1]
    x_under, x_over = i < 0, i >= dim_x - 1
    y_under, y_over = j < 0, j >= dim_y - 1
    x_oob = x_under or x_over
    y_oob = y_under or y_over

    i_floor, j_floor = int(np.floor(i)), int(np.floor(j))
    di, dj = F(i - np.floor(i)), F(j - np.floor(j))

    if not x_oob and not y_oob:
        return bilinear(di, dj,
                        p[i_floor, j_floor], p[i_floor, j_floor + 1],
                        p[i_floor + 1, j_floor], p[i_floor + 1, j_floor + 1])

    if x_oob and y_oob:  # corner
        p_edge = p[0 if x_under else dim_x - 1, 0 if y_under else dim_y - 1]
    elif x_oob:  # left/right boundary: lerp along j at the wall
        ei = 0 if x_under else dim_x - 1
        p_edge = lerp(dj, p[ei, j_floor], p[ei, j_floor + 1])
    else:  # top/bottom boundary: lerp along i at the wall
        ej = 0 if y_under else dim_y - 1
        p_edge = lerp(di, p[i_floor, ej], p[i_floor + 1, ej])

    if not no_slip:
        return p_edge

    factor = F(1)
    if x_oob:
        ox = F(-i) if x_under else F(i - (dim_x - 1))
        factor = factor * (F(1) - F(2) * ox if ox < 0.5 else F(0))
    if y_oob:
        oy = F(-j) if y_under else F(j - (dim_y - 1))
        factor = factor * (F(1) - F(2) * oy if oy < 0.5 else F(0))
    return factor * p_edge


def advect(p, vel, dt, no_slip):
    """advect.h:74-85: backtrace each node through vel and sample."""
    dim_x, dim_y = p.shape[0], p.shape[1]
    out = np.zeros_like(p)
    for i in range(dim_x):
        for j in range(dim_y):
            si = F(i) - vel[i, j, 0] * F(dt)
            sj = F(j) - vel[i, j, 1] * F(dt)
            out[i, j] = sample(p, si, sj, no_slip)
    return out


def divergence(v, dx=1.0):
    """finitediff.cpp:9-39: central differences, reflected ghost velocity."""
    dim_x, dim_y = v.shape[0], v.shape[1]
    inv = F(1.0) / (F(2.0) * F(dx))
    out = np.zeros((dim_x, dim_y), F)
    for i in range(dim_x):
        for j in range(dim_y):
            s = F(0)
            s = s + (-v[i - 1, j, 0] if i > 0 else v[i, j, 0])
            s = s + (v[i + 1, j, 0] if i < dim_x - 1 else -v[i, j, 0])
            s = s + (-v[i, j - 1, 1] if j > 0 else v[i, j, 1])
            s = s + (v[i, j + 1, 1] if j < dim_y - 1 else -v[i, j, 1])
            out[i, j] = s * inv
    return out


def subtract_gradient(v, p, dx=1.0):
    """finitediff.cpp:41-82: v -= grad(p), Neumann clamp at walls."""
    dim_x, dim_y = v.shape[0], v.shape[1]
    inv = F(1.0) / (F(2.0) * F(dx))
    out = v.copy()
    for i in range(dim_x):
        for j in range(dim_y):
            p_l = p[i - 1, j] if i > 0 else p[i, j]
            p_r = p[i + 1, j] if i < dim_x - 1 else p[i, j]
            p_d = p[i, j - 1] if j > 0 else p[i, j]
            p_u = p[i, j + 1] if j < dim_y - 1 else p[i, j]
            out[i, j, 0] = v[i, j, 0] - (p_r - p_l) * inv
            out[i, j, 1] = v[i, j, 1] - (p_u - p_d) * inv
    return out


NEG_A_II_INV = np.array([0, 0, -1.0 / 2.0, -1.0 / 3.0, -1.0 / 4.0], F)


def sor_sweep(p, d, omega, dx=1.0):
    """poisson.cpp:14-61: even-parity half-sweep then odd, in place (the
    reference starts with on_red=false, which selects (i+j)&1 == 0 cells)."""
    dim_x, dim_y = p.shape
    omega = F(omega)
    for color in (0, 1):
        for i in range(dim_x):
            for j in range(dim_y):
                if (i + j) % 2 != color:
                    continue
                p_sum = F(0)
                a_ii = 0
                if i > 0:
                    p_sum = p_sum + p[i - 1, j]
                    a_ii += 1
                if i < dim_x - 1:
                    p_sum = p_sum + p[i + 1, j]
                    a_ii += 1
                if j > 0:
                    p_sum = p_sum + p[i, j - 1]
                    a_ii += 1
                if j < dim_y - 1:
                    p_sum = p_sum + p[i, j + 1]
                    a_ii += 1
                p_gs = NEG_A_II_INV[a_ii] * (F(dx) * d[i, j] - p_sum)
                p[i, j] = (F(1) - omega) * p[i, j] + omega * p_gs
    return p


def poisson_solve(d, dx=1.0, iters=10, omega=1.96):
    """poisson.cpp:114-125 (zero-initialized)."""
    p = np.zeros_like(d)
    for _ in range(iters):
        sor_sweep(p, d, omega, dx)
    return p


def init_color(dim_x, dim_y):
    """.ino:203-241: angular RGB sectors + two sequential in-place blurs."""
    ci, cj = dim_x // 2, dim_y // 2
    c = np.zeros((dim_x, dim_y, 3), F)
    for i in range(dim_x):
        for j in range(dim_y):
            angle = np.arctan2(F(-(i - ci)), F(j - cj))
            if angle < -np.pi / 3:
                c[i, j] = (1, 0, 0)
            elif angle < np.pi / 3:
                c[i, j] = (0, 1, 0)
            else:
                c[i, j] = (0, 0, 1)
    # horizontal (j) in-place pass (.ino:220-229)
    for i in range(dim_x):
        for j in range(dim_y):
            left = c[i, j - 1] if j > 0 else c[i, j]
            right = c[i, j + 1] if j < dim_y - 1 else c[i, j]
            c[i, j] = F(0.25) * left + F(0.5) * c[i, j] + F(0.25) * right
    # vertical (i) in-place pass (.ino:231-241)
    for i in range(dim_x):
        for j in range(dim_y):
            top = c[i - 1, j] if i > 0 else c[i, j]
            bot = c[i + 1, j] if i < dim_x - 1 else c[i, j]
            c[i, j] = F(0.25) * top + F(0.5) * c[i, j] + F(0.25) * bot
    return c


def apply_impulses(vel, impulses):
    """.ino:264-269: poke velocity cells, later drags overwrite earlier."""
    dim_x, dim_y = vel.shape[0], vel.shape[1]
    for (i, j), (vi, vj) in impulses:
        i = min(max(int(i), 0), dim_x - 1)
        j = min(max(int(j), 0), dim_y - 1)
        vel[i, j, 0] = F(vi)
        vel[i, j, 1] = F(vj)
    return vel


def step(vel, color, impulses, dt=1 / 30.0, dx=1.0, iters=10, omega=1.96):
    """.ino:249-289: one full sim step."""
    vel = advect(vel, vel, dt, no_slip=True)
    vel = apply_impulses(vel, impulses)
    d = divergence(vel, dx)
    p = poisson_solve(d, dx, iters, omega)
    vel = subtract_gradient(vel, p, dx)
    color = advect(color, vel, dt, no_slip=False)
    return vel, color, d, p


def upscale_bilinear(color, s):
    """.ino:116-162 as direct (non-incremental) bilinear math."""
    dim_x, dim_y = color.shape[0], color.shape[1]
    out = np.zeros(((dim_x - 1) * s, (dim_y - 1) * s, color.shape[2]), F)
    for oi in range((dim_x - 1) * s):
        for oj in range((dim_y - 1) * s):
            i, a = divmod(oi, s)
            j, b = divmod(oj, s)
            out[oi, oj] = bilinear(F(a) / F(s), F(b) / F(s),
                                   color[i, j], color[i, j + 1],
                                   color[i + 1, j], color[i + 1, j + 1])
    return out


def pack_rgb565(rgb, bswap=True):
    """.ino:164-176 on unit floats via UQ32 top-bit extraction."""
    from esp32_fluid_simulation_tpu.utils.uq32 import (float_to_uq32,
                                                       uq32_top_bits)
    r = uq32_top_bits(float_to_uq32(rgb[..., 0]), 5)
    g = uq32_top_bits(float_to_uq32(rgb[..., 1]), 6)
    b = uq32_top_bits(float_to_uq32(rgb[..., 2]), 5)
    word = (r << 11) | (g << 5) | b
    if bswap:
        word = ((word << 8) | (word >> 8)) & 0xFFFF
    return word.astype(np.uint16)
