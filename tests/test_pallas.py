"""Pallas TPU kernel semantics, pinned on CPU via interpreter mode.

The real-hardware performance path is exercised by bench.py on the chip;
these tests keep the kernel *math* under CI (SURVEY.md §7.4: A/B each Pallas
kernel against the jnp version behind the same API)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from esp32_fluid_simulation_tpu.ops.advect import advect
from esp32_fluid_simulation_tpu.ops.poisson import sor_solve

F = np.float32


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    # the kernels capture pl.pallas_call at call time, so reimport is safe
    yield


@pytest.mark.parametrize("no_slip", [False, True])
@pytest.mark.parametrize("shape", [(61, 81), (96, 200)])
def test_advect_pallas_matches_jnp(rng, shape, no_slip):
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    f = jnp.asarray(rng.random(shape, dtype=F))
    v = jnp.asarray((60 * rng.standard_normal((2,) + shape)).astype(F))
    a = advect(f, v, 1 / 30., no_slip)
    b = advect_pallas(f, v, 1 / 30., no_slip, max_disp=12)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=2e-5)


def test_advect_pallas_multichannel(rng):
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    f = jnp.asarray(rng.random((3, 96, 200), dtype=F))
    v = jnp.asarray((30 * rng.standard_normal((2, 96, 200))).astype(F))
    a = advect(f, v, 1 / 30., False)
    b = advect_pallas(f, v, 1 / 30., False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=2e-5)


def test_advect_pallas_clip01_bit_equal(rng):
    """clip01=True == jnp.clip(advect_pallas(...), 0, 1) bit-for-bit (the
    fused dye clamp the production step uses), f32 and bf16."""
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    shape = (48, 96)
    v = jnp.asarray((90 * rng.standard_normal((2,) + shape)).astype(F))
    for dtype in (jnp.float32, jnp.bfloat16):
        # push values outside [0, 1] so the clamp actually acts
        f = (3.0 * jnp.asarray(rng.random((3,) + shape, dtype=F))
             - 1.0).astype(dtype)
        ref = jnp.clip(advect_pallas(f, v, 1 / 30., False), 0.0, 1.0)
        got = advect_pallas(f, v, 1 / 30., False, clip01=True)
        assert got.dtype == ref.dtype
        np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                      np.asarray(got, np.float32))


def test_advect_pallas_cfl_clamp(rng):
    """Displacements beyond max_disp are clamped — equivalent to advecting
    through a velocity field clipped to max_disp/dt."""
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    shape = (48, 96)
    f = jnp.asarray(rng.random(shape, dtype=F))
    v = jnp.asarray((400 * rng.standard_normal((2,) + shape)).astype(F))
    dt = 1 / 30.
    got = advect_pallas(f, v, dt, False, max_disp=4)
    vc = jnp.clip(v, -4 / dt, 4 / dt)
    want = advect(f, vc, dt, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=2e-5)


def test_sor_pallas_matches_jnp(rng):
    from esp32_fluid_simulation_tpu.ops.pallas.sor import sor_solve_pallas
    for shape in [(61, 81), (130, 200)]:
        d = jnp.asarray(rng.standard_normal(shape).astype(F))
        a = sor_solve(d, 1.0, 10, 1.96)
        b = sor_solve_pallas(d, 1.0, 10, 1.96, tile_h=64, tile_w=128)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_step_with_pallas_solver(rng):
    """solver='sor_pallas' + advect_impl='pallas' through the model step."""
    from esp32_fluid_simulation_tpu import (SimConfig, Impulses, init_state,
                                            make_step)
    cfg = SimConfig(shape=(64, 96), solver="sor_pallas",
                    advect_impl="pallas", advect_max_disp=8)
    ref = SimConfig(shape=(64, 96), solver="sor", advect_impl="jnp")
    imp = Impulses.from_lists(cfg, [(30, 40)], [(150.0, -100.0)])
    st_a = make_step(cfg, donate=False)(init_state(cfg), imp)
    st_b = make_step(ref, donate=False)(init_state(ref), imp)
    np.testing.assert_allclose(np.asarray(st_a.velocity),
                               np.asarray(st_b.velocity),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_a.color),
                               np.asarray(st_b.color),
                               rtol=1e-4, atol=1e-4)


def test_project_fused_matches_composed(rng):
    from esp32_fluid_simulation_tpu.ops.pallas.project import (
        project_fused_pallas)
    from esp32_fluid_simulation_tpu.ops.fd import (divergence,
                                                   subtract_gradient)
    v = jnp.asarray((5 * rng.standard_normal((2, 130, 200))).astype(F))
    d = divergence(v, 1.0)
    p_ref = sor_solve(d, 1.0, 10, 1.96)
    v_ref = subtract_gradient(v, p_ref, 1.0)
    v_out, p_out = project_fused_pallas(v, 1.0, 10, 1.96,
                                        tile_h=64, tile_w=128)
    np.testing.assert_allclose(np.asarray(v_out), np.asarray(v_ref),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_ref),
                               rtol=1e-4, atol=2e-5)


def test_step_with_fused_projection(rng):
    from esp32_fluid_simulation_tpu import (SimConfig, Impulses, init_state,
                                            make_step)
    cfg = SimConfig(shape=(64, 96), solver="fused_pallas")
    ref = SimConfig(shape=(64, 96), solver="sor")
    imp = Impulses.from_lists(cfg, [(30, 40)], [(150.0, -100.0)])
    st_a = make_step(cfg, donate=False)(init_state(cfg), imp)
    st_b = make_step(ref, donate=False)(init_state(ref), imp)
    np.testing.assert_allclose(np.asarray(st_a.velocity),
                               np.asarray(st_b.velocity),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["planes", "transpose"])
@pytest.mark.parametrize("shape,s", [((61, 81), 4), ((33, 130), 4),
                                     ((17, 129), 2)])
def test_render_pallas_bit_exact(rng, shape, s, impl):
    from esp32_fluid_simulation_tpu.render.pallas_upscale import (
        render_rgb565_pallas)
    from esp32_fluid_simulation_tpu.render import render_rgb565
    c = jnp.asarray(rng.random((3,) + shape, dtype=F))
    a = np.asarray(render_rgb565(c, s=s))
    b = np.asarray(render_rgb565_pallas(c, s=s, tile_h=16, tile_w=128,
                                        impl=impl))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("impl", ["planes", "transpose"])
def test_render_pallas_multi_tile(rng, impl):
    """Larger grid spanning several (64, 512) tiles."""
    from esp32_fluid_simulation_tpu.render.pallas_upscale import (
        render_rgb565_pallas)
    from esp32_fluid_simulation_tpu.render import render_rgb565
    c = jnp.asarray(rng.random((3, 129, 1025), dtype=F))
    a = np.asarray(render_rgb565(c, s=4))
    b = np.asarray(render_rgb565_pallas(c, s=4, tile_h=64, tile_w=512,
                                        impl=impl))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("impl", ["planes", "transpose"])
def test_render_pallas_unit_range_bit_exact(rng, impl):
    """unit_range=True (min-only clamp) is bit-exact for [0, 1] inputs,
    including exact 0.0/1.0 endpoints (the only codes the dropped lower/
    upper clips could affect)."""
    from esp32_fluid_simulation_tpu.render.pallas_upscale import (
        render_rgb565_pallas)
    from esp32_fluid_simulation_tpu.render import render_rgb565
    c = rng.random((3, 61, 81), dtype=F)
    c[:, ::7, ::5] = 1.0
    c[:, 1::9, ::3] = 0.0
    c = jnp.asarray(c)
    a = np.asarray(render_rgb565(c, s=4))
    b = np.asarray(render_rgb565_pallas(c, s=4, tile_h=16, tile_w=128,
                                        impl=impl, unit_range=True))
    np.testing.assert_array_equal(a, b)


def test_advect_pallas_bf16_pack_bit_equal(rng):
    """The packed-pair bf16 gather (pack=True, auto for bf16 fields) is
    bit-identical to the unpacked gathers (tilewide variant) — the f32
    widening of bf16 carries the bf16 bits exactly.  Also covers
    pack+return_minmax (production: bf16 dye + MacCormack) and the lossy
    sample_bf16 opt-in on f32 fields (ADVICE r2)."""
    from esp32_fluid_simulation_tpu.ops.pallas.advect import (
        advect_pallas, advect_maccormack_pallas)
    shape = (96, 200)
    f32 = jnp.asarray(rng.random(shape, dtype=F))
    fb = f32.astype(jnp.bfloat16)
    v = jnp.asarray(np.clip(60 * rng.standard_normal((2,) + shape),
                            -300, 300).astype(F))
    packed = advect_pallas(fb, v, 1 / 30., False, max_disp=12)
    unpacked = advect_pallas(fb, v, 1 / 30., False, max_disp=12,
                             variant="tilewide")
    np.testing.assert_array_equal(
        np.asarray(packed, np.float32), np.asarray(unpacked, np.float32))
    # pack + return_minmax: vs the jnp minmax reference
    out, mn, mx = advect_pallas(fb, v, 1 / 30., False, max_disp=12,
                                return_minmax=True)
    from esp32_fluid_simulation_tpu.ops.advect import (
        sample_linear, _backtrace_coords, advect_maccormack)
    want, wmn, wmx = sample_linear(
        fb, _backtrace_coords(v.astype(F), 1 / 30.), no_slip=False,
        return_minmax=True)
    np.testing.assert_allclose(np.asarray(mn, np.float32),
                               np.asarray(wmn, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(mx, np.float32),
                               np.asarray(wmx, np.float32),
                               rtol=2e-2, atol=2e-2)
    # MacCormack through the packed path stays close to the jnp version
    mc = advect_maccormack_pallas(fb, v, 1 / 30., False, max_disp=12)
    mc_ref = advect_maccormack(fb, v, 1 / 30., False)
    np.testing.assert_allclose(np.asarray(mc, np.float32),
                               np.asarray(mc_ref, np.float32),
                               rtol=5e-2, atol=5e-2)
    # sample_bf16 on an f32 field == advecting the bf16-rounded field with
    # f32 math/output (the kernel keeps f32 accumulation and output dtype)
    lossy = advect_pallas(f32, v, 1 / 30., False, max_disp=12,
                          sample_bf16=True)
    ref = advect(fb.astype(F), v, 1 / 30., False)
    np.testing.assert_allclose(np.asarray(lossy), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_advect_pallas_panel_boundary_select(rng):
    """Adversarial column displacements for the panel variant's one-hot
    source-panel select (round-3 restructure): constant velocities push
    every output's source column right up to (and across) the 128-lane
    panel boundaries, in both directions, with fractional parts 0 / 0.5 /
    ~1 (the rolled-window second tap).  Bit-compared against the tilewide
    kernel and value-compared against the jnp op."""
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    shape = (16, 512)
    f = jnp.asarray(rng.random(shape, dtype=F))
    fb = f.astype(jnp.bfloat16)
    dt = 1 / 30.
    for cells in (11.0, 11.5, 11.984375, -11.0, -11.5, -11.984375, 61.5,
                  -61.5):
        md = 62 if abs(cells) > 12 else 12
        v = jnp.stack([jnp.zeros(shape, F),
                       jnp.full(shape, F(cells / dt))])
        want = advect(f, v, dt, False)
        got = advect_pallas(f, v, dt, False, max_disp=md, tile_h=8,
                            tile_w=256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"cells={cells}")
        tw = advect_pallas(f, v, dt, False, max_disp=md, tile_h=8,
                           tile_w=256, variant="tilewide")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(tw),
                                      err_msg=f"cells={cells} (vs tilewide)")
        gb = advect_pallas(fb, v, dt, False, max_disp=md, tile_h=8,
                           tile_w=256)
        tb = advect_pallas(fb, v, dt, False, max_disp=md, tile_h=8,
                           tile_w=256, variant="tilewide")
        np.testing.assert_array_equal(
            np.asarray(gb, np.float32), np.asarray(tb, np.float32),
            err_msg=f"cells={cells} (bf16 pack)")


def test_advect_pallas_static_unroll(rng):
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    f = jnp.asarray(rng.random((96, 200), dtype=F))
    v = jnp.asarray((60 * rng.standard_normal((2, 96, 200))).astype(F))
    a = advect_pallas(f, v, 1 / 30., True, max_disp=8)
    b = advect_pallas(f, v, 1 / 30., True, max_disp=8, static_unroll=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_advect3d_pallas_matches_jnp(rng):
    """3D gather kernel (ops/pallas/advect3d) == rank-polymorphic jnp advect
    for in-clamp velocities, f32 exact and bf16 packed."""
    from esp32_fluid_simulation_tpu.ops.pallas.advect3d import advect3d_pallas
    shape = (12, 24, 136)
    f = jnp.asarray(rng.random((2,) + shape, dtype=F))
    v = jnp.asarray(np.clip(40 * rng.standard_normal((3,) + shape),
                            -110, 110).astype(F))
    for no_slip in (False, True):
        want = advect(f, v, 1 / 30., no_slip)
        got = advect3d_pallas(f, v, 1 / 30., no_slip, max_disp=4,
                              tile_d=2, tile_h=16)
        # trilinear weights accumulate in a different association than the
        # nested-lerp jnp form: ~1 ulp of slack per tap
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=5e-5)
    fb = f.astype(jnp.bfloat16)
    got_b = advect3d_pallas(fb, v, 1 / 30., False, max_disp=4,
                            tile_d=2, tile_h=16)
    want_b = advect(fb, v, 1 / 30., False)
    np.testing.assert_allclose(np.asarray(got_b, np.float32),
                               np.asarray(want_b, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_advect3d_pallas_panel_boundary_select(rng):
    """3D analogue of the panel-boundary test: constant column velocities
    drive every output's source column across the 128-lane panel boundary,
    exercising the 3D kernel's one-hot source-panel select (f32 rolled
    second tap and packed bf16), vs the jnp op."""
    from esp32_fluid_simulation_tpu.ops.pallas.advect3d import advect3d_pallas
    shape = (4, 8, 384)
    f = jnp.asarray(rng.random(shape, dtype=F))
    fb = f.astype(jnp.bfloat16)
    dt = 1 / 30.
    for cells in (3.0, 3.5, -3.5, -3.984375):
        v = jnp.stack([jnp.zeros(shape, F), jnp.zeros(shape, F),
                       jnp.full(shape, F(cells / dt))])
        want = advect(f, v, dt, False)
        got = advect3d_pallas(f, v, dt, False, max_disp=4, tile_d=2,
                              tile_h=8, tile_w=256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"cells={cells}")
        got_b = advect3d_pallas(fb, v, dt, False, max_disp=4, tile_d=2,
                                tile_h=8, tile_w=256)
        want_b = advect(fb, v, dt, False)
        np.testing.assert_allclose(np.asarray(got_b, np.float32),
                                   np.asarray(want_b, np.float32),
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"cells={cells} (bf16)")


def test_advect_maccormack_pallas_matches_jnp(rng):
    """Kernel-backed MacCormack (in-kernel stencil extrema + backward pass)
    == ops.advect.advect_maccormack for in-clamp velocities."""
    from esp32_fluid_simulation_tpu.ops.pallas.advect import (
        advect_maccormack_pallas)
    from esp32_fluid_simulation_tpu.ops.advect import advect_maccormack
    shape = (96, 200)
    f = jnp.asarray(rng.random((3,) + shape, dtype=F))
    v = jnp.asarray(np.clip(60 * rng.standard_normal((2,) + shape),
                            -320, 320).astype(F))
    for no_slip in (False, True):
        want = advect_maccormack(f, v, 1 / 30., no_slip)
        got = advect_maccormack_pallas(f, v, 1 / 30., no_slip, max_disp=12)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=2e-5)


def test_tiled_domain_kernel_matches_fallback(rng):
    """Tiled-domain (config 4) kernels: member-local clamps/no-slip in the
    advect kernel + member-modular BCs in the fused projection == the
    vmapped-member jnp fallback."""
    import dataclasses
    from esp32_fluid_simulation_tpu import (SimConfig, Impulses, init_state,
                                            make_step)
    kcfg = SimConfig(shape=(64, 256), domain_tile=(32, 128), sor_iters=4,
                     solver="fused_pallas", advect_impl="pallas",
                     advect_max_disp=8)
    ref = dataclasses.replace(kcfg, solver="sor", advect_impl="jnp")
    imp = Impulses.from_lists(
        kcfg,
        [(10, 30), (40, 30), (16, 200), (50, 180)],
        [(120.0, -60.0), (-90.0, 100.0), (60.0, 110.0), (-50.0, -80.0)])

    # force the kernel path despite the CPU test backend
    import esp32_fluid_simulation_tpu.models.stable_fluids as M
    orig = M._use_pallas_advect
    M._use_pallas_advect = lambda cfg: (cfg.advect_impl == "pallas"
                                        and cfg.ndim == 2)
    try:
        st_k = init_state(kcfg)
        fnk = make_step(kcfg, donate=False)
        for t in range(3):
            st_k = fnk(st_k, imp if t == 0 else Impulses.none(kcfg))
    finally:
        M._use_pallas_advect = orig

    st_r = init_state(ref)
    fnr = make_step(ref, donate=False)
    for t in range(3):
        st_r = fnr(st_r, imp if t == 0 else Impulses.none(ref))

    np.testing.assert_allclose(np.asarray(st_k.velocity),
                               np.asarray(st_r.velocity),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_k.color),
                               np.asarray(st_r.color),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("shape,kw", [
    ((12, 20, 136), dict(tile_d=4, tile_h=16, tile_w=128, chunk=2)),
    ((9, 33, 130), dict(tile_d=4, tile_h=16, tile_w=128, chunk=3)),
])
def test_sor3d_packed_matches_jnp(rng, shape, kw):
    """3D packed-RB kernel (ops/pallas/sor3d) == rank-polymorphic jnp
    sor_solve, including chunked-launch continuation and odd shapes."""
    from esp32_fluid_simulation_tpu.ops.pallas.sor3d import sor3d_packed_pallas
    d = jnp.asarray(rng.standard_normal(shape).astype(F))
    for iters in (1, 5):
        ref = np.asarray(sor_solve(d, 1.0, iters, 1.5))
        got = np.asarray(sor3d_packed_pallas(d, 1.0, iters, 1.5, **kw))
        np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-6)


def test_sor3d_chunk_exceeding_lane_halo_rejected(rng):
    """chunk > 64 would out-run the fixed 128-lane column halo and return a
    silently wrong solve (code-review r3) — must raise."""
    from esp32_fluid_simulation_tpu.ops.pallas.sor3d import sor3d_packed_pallas
    d = jnp.asarray(rng.standard_normal((8, 16, 128)).astype(F))
    with pytest.raises(ValueError, match="column halo"):
        sor3d_packed_pallas(d, 1.0, 130, 1.5, chunk=65)


@pytest.mark.slow
def test_fd3d_kernels_match_jnp(rng):
    """3D divergence / gradient-subtract kernels (ops/pallas/fd3d) == the
    rank-polymorphic jnp stencils, including reflected-ghost and Neumann
    wall handling at odd shapes."""
    from esp32_fluid_simulation_tpu.ops.pallas.fd3d import (
        divergence3d_pallas, subtract_gradient3d_pallas)
    from esp32_fluid_simulation_tpu.ops.fd import (divergence,
                                                   subtract_gradient)
    for shape in [(12, 20, 136), (9, 33, 130)]:
        v = jnp.asarray(rng.standard_normal((3,) + shape).astype(F))
        p = jnp.asarray(rng.standard_normal(shape).astype(F))
        np.testing.assert_array_equal(
            np.asarray(divergence3d_pallas(v, 0.7, tile_d=4, tile_h=16,
                                           tile_w=128)),
            np.asarray(divergence(v, 0.7)))
        np.testing.assert_allclose(
            np.asarray(subtract_gradient3d_pallas(v, p, 0.7, tile_d=4,
                                                  tile_h=16, tile_w=128)),
            np.asarray(subtract_gradient(v, p, 0.7)),
            rtol=1e-6, atol=1e-6)


def test_project_fused_impulses_bit_equal(rng):
    """The in-kernel drag-queue drain (impulses= arg) is bit-identical to
    apply_impulses -> project_fused_pallas, duplicate positions (last
    active slot wins) and clamped out-of-range positions included."""
    from esp32_fluid_simulation_tpu import SimConfig, Impulses
    from esp32_fluid_simulation_tpu.models.stable_fluids import (
        apply_impulses)
    from esp32_fluid_simulation_tpu.ops.pallas.project import (
        project_fused_pallas)

    cfg = SimConfig(shape=(64, 96), sor_iters=3)
    vel = jnp.asarray(rng.normal(0, 40, (2, 64, 96)).astype(F))
    imp = Impulses.from_lists(
        cfg, [(20, 30), (20, 30), (40, 50), (99, -3)],
        [(90.0, -45.0), (33.0, 44.0), (-60.0, 120.0), (7.0, 8.0)])

    ref_v, ref_p = project_fused_pallas(apply_impulses(vel, imp), 1.0, 3,
                                        1.96)
    got_v, got_p = project_fused_pallas(vel, 1.0, 3, 1.96, impulses=imp)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))


def test_advect_sloop_matches_panel(rng):
    """The round-4 swapped-loop shift walk is bit-identical to the proven
    panel kernel (f32 exact path, bf16 pack path, no-slip, minmax)."""
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas

    vel = jnp.asarray(rng.normal(0, 80, (2, 96, 160)).astype(F))
    dye = jnp.asarray(rng.random((3, 96, 160)).astype(F))
    for f, ns in ((dye, False), (vel, True)):
        a = advect_pallas(f, vel, 1 / 30, ns, max_disp=8, tile_h=32,
                          tile_w=128, variant="panel")
        b = advect_pallas(f, vel, 1 / 30, ns, max_disp=8, tile_h=32,
                          tile_w=128, variant="sloop")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    dyeb = dye.astype(jnp.bfloat16)
    a = advect_pallas(dyeb, vel, 1 / 30, False, max_disp=8, variant="panel",
                      clip01=True)
    b = advect_pallas(dyeb, vel, 1 / 30, False, max_disp=8, variant="sloop",
                      clip01=True)
    np.testing.assert_array_equal(np.asarray(a).view(np.uint16),
                                  np.asarray(b).view(np.uint16))
    am = advect_pallas(dye, vel, 1 / 30, False, max_disp=8, variant="panel",
                       return_minmax=True)
    bm = advect_pallas(dye, vel, 1 / 30, False, max_disp=8, variant="sloop",
                       return_minmax=True)
    for x, y in zip(am, bm):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_advect_sloop_nopad_bit_equal(rng):
    """The nopad (clamped-patchwork-window DMA, ops/pallas/window.py)
    sloop path — the DEFAULT when eligible since the unconditional clamped
    pieces beat the padded path on silicon (vel f32 3.11 -> 2.34 ms at
    4096^2, tools/nopad_evolved_probe.py) — is bit-identical to the padded
    path on every eligible dtype/channel combo, including the domain-edge
    programs whose skipped strips must be zeroed."""
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas

    vel = jnp.asarray(rng.normal(0, 80, (2, 96, 256)).astype(F))
    dye = jnp.asarray(rng.random((3, 96, 256)).astype(F))
    kw = dict(max_disp=8, tile_h=32, tile_w=128, variant="sloop")
    for f, ns, extra in ((vel, True, {}), (dye, False, {}),
                         (dye.astype(jnp.bfloat16), False,
                          dict(clip01=True))):
        a = advect_pallas(f, vel, 1 / 30, ns, nopad=False, **kw, **extra)
        b = advect_pallas(f, vel, 1 / 30, ns, nopad=True, **kw, **extra)
        av, bv = np.asarray(a), np.asarray(b)
        if av.itemsize == 2:      # bf16: compare raw bits
            av, bv = av.view(np.uint16), bv.view(np.uint16)
        np.testing.assert_array_equal(av, bv)
    with pytest.raises(ValueError, match="nopad-eligible"):
        advect_pallas(dye[:, :, :160], vel[:, :, :160], 1 / 30, False,
                      nopad=True, **kw)


def test_advect_pallas_rgb565_bit_equal(rng):
    """rgb565=True (the s=1 RGB565 pack riding the dye-advect store — the
    production step_render path) returns a frame bit-identical to
    render_rgb565(out, s=1) on the stored color, for bf16 and f32 dye,
    with and without bswap.  Also proven bit-exact on v5e silicon at
    4096^2 (tools/step_render_probe.py)."""
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    from esp32_fluid_simulation_tpu.render import render_rgb565

    vel = jnp.asarray(rng.normal(0, 80, (2, 96, 256)).astype(F))
    kw = dict(max_disp=8, tile_h=32, tile_w=128, variant="sloop")
    for dtype in (jnp.bfloat16, jnp.float32):
        dye = (3.0 * jnp.asarray(rng.random((3, 96, 256), dtype=F))
               - 1.0).astype(dtype)
        for bswap in (True, False):
            out, frame = advect_pallas(dye, vel, 1 / 30, False, clip01=True,
                                       rgb565=True, bswap=bswap, **kw)
            ref_out = advect_pallas(dye, vel, 1 / 30, False, clip01=True,
                                    **kw)
            ref_frame = render_rgb565(ref_out, s=1, bswap=bswap,
                                      unit_range=True)
            np.testing.assert_array_equal(
                np.asarray(out).view(np.uint16 if out.dtype.itemsize == 2
                                     else np.uint32),
                np.asarray(ref_out).view(np.uint16
                                         if out.dtype.itemsize == 2
                                         else np.uint32))
            assert frame.shape == (95, 255) and frame.dtype == jnp.uint16
            np.testing.assert_array_equal(np.asarray(frame),
                                          np.asarray(ref_frame))
    with pytest.raises(ValueError, match="rgb565"):
        advect_pallas(dye, vel, 1 / 30, False, rgb565=True, **kw)


def test_step_render_fused_matches_composed(rng, monkeypatch):
    """models.step_render's fused path (kernel advect + in-store RGB565)
    == step() + render_rgb565 bit-for-bit, forced onto the kernel path on
    CPU via the interpret fixture."""
    from esp32_fluid_simulation_tpu import SimConfig, render_rgb565
    from esp32_fluid_simulation_tpu.models import stable_fluids as sf

    monkeypatch.setattr(sf, "_use_pallas_advect", lambda cfg: True)
    cfg = SimConfig(shape=(64, 128), scaling=1, solver="fused_pallas",
                    advect_impl="pallas", color_dtype="bfloat16",
                    advect_max_disp=8)
    st = sf.init_state(cfg)
    from esp32_fluid_simulation_tpu.state import Impulses
    imp = Impulses.from_lists(cfg, [(5, 7), (20, 40)],
                              [(30.0, -12.0), (-8.0, 25.0)])
    st2, frame = sf.step_render(st, imp, cfg)
    ref = sf.step(st, imp, cfg)
    ref_frame = render_rgb565(ref.color, s=1, unit_range=cfg.clamps_dye)
    np.testing.assert_array_equal(
        np.asarray(st2.velocity), np.asarray(ref.velocity))
    np.testing.assert_array_equal(
        np.asarray(st2.color).view(np.uint16),
        np.asarray(ref.color).view(np.uint16))
    np.testing.assert_array_equal(np.asarray(frame), np.asarray(ref_frame))


def test_advect_overlay_drain_bit_equal(rng):
    """overlay= (the impulse drain riding the advect store) ==
    apply_impulses(advect(...)) bit-for-bit, incl. duplicate-slot
    last-wins order and zero-velocity overwrites, f32 and bf16 fields."""
    from esp32_fluid_simulation_tpu import SimConfig
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    from esp32_fluid_simulation_tpu.models.stable_fluids import (
        apply_impulses, impulse_overlay)
    from esp32_fluid_simulation_tpu.state import Impulses

    shape = (64, 128)
    cfg = SimConfig(shape=shape, max_impulses=8)
    vel = jnp.asarray((60 * rng.standard_normal((2,) + shape)).astype(F))
    # duplicate position (5, 7): the LAST active slot must win; slot 3 is a
    # zero-velocity overwrite (flag channel, not value, must gate writes)
    imp = Impulses.from_lists(
        cfg, [(5, 7), (20, 40), (5, 7), (30, 100)],
        [(30.0, -12.0), (-8.0, 25.0), (99.0, 1.0), (0.0, 0.0)])
    kw = dict(max_disp=8, tile_h=32, tile_w=128, variant="sloop")
    for dtype in (jnp.float32, jnp.bfloat16):
        v = vel.astype(dtype)
        ref = apply_impulses(
            advect_pallas(v, v, 1 / 30, True, self_advect=True, **kw), imp)
        got = advect_pallas(v, v, 1 / 30, True, self_advect=True,
                            overlay=impulse_overlay(imp, shape), **kw)
        np.testing.assert_array_equal(
            np.asarray(got).view(np.uint16 if dtype == jnp.bfloat16
                                 else np.uint32),
            np.asarray(ref).view(np.uint16 if dtype == jnp.bfloat16
                                 else np.uint32))
    # two-input (non-self-advect) form too
    dye = jnp.asarray(rng.random((2,) + shape, dtype=F))
    ref = apply_impulses(advect_pallas(dye, vel, 1 / 30, False, **kw), imp)
    got = advect_pallas(dye, vel, 1 / 30, False,
                        overlay=impulse_overlay(imp, shape), **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_step_tiled_overlay_matches_scatter(rng, monkeypatch):
    """_step_tiled's overlay drain (kernel path) == the scatter apply_fn
    bit-for-bit on a supergrid with per-member impulses."""
    import functools
    from esp32_fluid_simulation_tpu import SimConfig
    from esp32_fluid_simulation_tpu.models import stable_fluids as sf
    from esp32_fluid_simulation_tpu.models.ensemble import (
        tiled_ensemble_config, stack_impulses, _apply_member_impulses,
        _member_impulse_overlay)
    from esp32_fluid_simulation_tpu.io_host.touch import scripted_swirl

    monkeypatch.setattr(sf, "_use_pallas_advect", lambda cfg: True)
    mcfg = SimConfig(shape=(32, 128), scaling=1, color_dtype="bfloat16",
                     advect_max_disp=8)
    cfg, gh, gw = tiled_ensemble_config(mcfg, 4)
    mh, mw = mcfg.shape
    imp = stack_impulses([scripted_swirl(mcfg, 7 * m) for m in range(4)])
    apply_fn = functools.partial(_apply_member_impulses, imp=imp,
                                 gh=gh, gw=gw, mh=mh, mw=mw)
    st = sf.init_state(cfg)
    a = sf._step_tiled(st, None, cfg, apply_fn=apply_fn)
    b = sf._step_tiled(st, None, cfg, apply_fn=apply_fn,
                       overlay=_member_impulse_overlay(imp, gh, gw, mh, mw))
    np.testing.assert_array_equal(np.asarray(a.velocity),
                                  np.asarray(b.velocity))
    np.testing.assert_array_equal(np.asarray(a.color).view(np.uint16),
                                  np.asarray(b.color).view(np.uint16))


def test_step_render_tiled_matches_composed(rng, monkeypatch):
    """step_render on a domain_tile config (the tiled supergrid) routes the
    RGB565 pack onto the member-mode dye-advect store (VERDICT r4 next #3)
    and matches _step_tiled + render_rgb565 bit-for-bit."""
    from esp32_fluid_simulation_tpu import SimConfig, render_rgb565
    from esp32_fluid_simulation_tpu.models import stable_fluids as sf

    monkeypatch.setattr(sf, "_use_pallas_advect", lambda cfg: True)
    cfg = SimConfig(shape=(64, 256), scaling=1, solver="fused_pallas",
                    advect_impl="pallas", color_dtype="bfloat16",
                    advect_max_disp=8, domain_tile=(32, 128))
    st = sf.init_state(cfg)
    from esp32_fluid_simulation_tpu.state import Impulses
    imp = Impulses.from_lists(cfg, [(5, 7), (40, 200)],
                              [(30.0, -12.0), (-8.0, 25.0)])
    st2, frame = sf.step_render(st, imp, cfg)
    ref = sf.step(st, imp, cfg)
    ref_frame = render_rgb565(ref.color, s=1, unit_range=cfg.clamps_dye)
    np.testing.assert_array_equal(
        np.asarray(st2.velocity), np.asarray(ref.velocity))
    np.testing.assert_array_equal(
        np.asarray(st2.color).view(np.uint16),
        np.asarray(ref.color).view(np.uint16))
    np.testing.assert_array_equal(np.asarray(frame), np.asarray(ref_frame))


def test_project_fused_clamped_window_bit_equal(rng):
    """The clamped-patchwork window path (exact tiling: windows stream from
    the UNPADDED field, ops/pallas/window.py clamp mode) == the padded path
    bit-for-bit — cells beyond the trapezoid horizon cannot reach the owned
    tile, and the in_dom mask zeroes the misplaced edge data.  Also proven
    bit-exact on v5e silicon at 4096^2 (tools/proj_clamp_probe.py:
    3.66 -> 1.85 ms)."""
    from esp32_fluid_simulation_tpu.ops.pallas import project as P

    v = jnp.asarray((5 * rng.standard_normal((2, 128, 256))).astype(F))
    # exact tiling (128/64, 256/128) -> clamped mode engages by default
    v_c, p_c = P.project_fused_pallas(v, 1.0, 10, 1.96,
                                      tile_h=64, tile_w=128)
    v_q, p_q = P.project_fused_pallas(v, 1.0, 10, 1.96,
                                      tile_h=64, tile_w=128, clamped=False)
    np.testing.assert_array_equal(np.asarray(v_c), np.asarray(v_q))
    np.testing.assert_array_equal(np.asarray(p_c), np.asarray(p_q))
    with pytest.raises(ValueError, match="clamped"):
        P.project_fused_pallas(v[:, :120, :], 1.0, 10, 1.96,
                               tile_h=64, tile_w=128, clamped=True)


def test_advect_self_advect_bit_equal(rng):
    """self_advect=True (backtrace velocity read from the window core, no
    second BlockSpec read of the field) == the two-input path bit-for-bit,
    padded and nopad, exact and non-exact tiling."""
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas

    for shape in ((96, 256), (88, 200)):   # exact / non-exact tiling
        vel = jnp.asarray(rng.normal(0, 80, (2,) + shape).astype(F))
        kw = dict(max_disp=8, tile_h=32, tile_w=128, variant="sloop")
        a = advect_pallas(vel, vel, 1 / 30, True, **kw)
        b = advect_pallas(vel, vel, 1 / 30, True, self_advect=True, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="self_advect"):
        advect_pallas(jnp.zeros((3, 96, 256), F), vel, 1 / 30, False,
                      self_advect=True)
