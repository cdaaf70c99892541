"""AOT Mosaic compile checks: every Pallas kernel is compiled against a
local TPU v5e *topology* (no device attached) so the real Mosaic compiler —
not just the interpreter — gates CI.  This catches hardware-only failures
(vreg alignment, dynamic_gather source-width limits, constant-index gather
lowering crashes) that interpret mode cannot see."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

topologies = pytest.importorskip("jax.experimental.topologies")


@pytest.fixture(scope="module")
def tpu_sharding():
    try:
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x2")
    except Exception as e:  # no local libtpu AOT support
        pytest.skip(f"TPU topology unavailable: {e}")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    return NamedSharding(
        Mesh(np.array(topo.devices[:1]).reshape(1), ("d",)), P())


def _sds(sh, shape, dt=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dt, sharding=sh)


def test_advect_kernel_compiles(tpu_sharding):
    from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
    jax.jit(lambda f, v: advect_pallas(f, v, 1 / 30., True, 12)).lower(
        _sds(tpu_sharding, (512, 1024)),
        _sds(tpu_sharding, (2, 512, 1024))).compile()
    # fused dye clamp (production path: 3ch bf16 + clip01)
    jax.jit(lambda f, v: advect_pallas(f, v, 1 / 30., False, 12,
                                       clip01=True)).lower(
        _sds(tpu_sharding, (3, 512, 1024), jnp.bfloat16),
        _sds(tpu_sharding, (2, 512, 1024))).compile()


def test_sor_kernel_compiles(tpu_sharding):
    from esp32_fluid_simulation_tpu.ops.pallas.sor import sor_solve_pallas
    jax.jit(lambda d: sor_solve_pallas(d, 1.0, 10, 1.96)).lower(
        _sds(tpu_sharding, (1024, 1024))).compile()


def test_project_kernel_compiles(tpu_sharding):
    from esp32_fluid_simulation_tpu.ops.pallas.project import (
        project_fused_pallas)
    # 1024^2: the whole width is one tile — this shape caught a scoped-vmem
    # OOM (16.41M > 16M) when the auto tile picker chose tile_h=256
    jax.jit(lambda v: project_fused_pallas(v, 1.0, 10, 1.96)).lower(
        _sds(tpu_sharding, (2, 1024, 1024))).compile()
    jax.jit(lambda v: project_fused_pallas(v, 1.0, 10, 1.96)).lower(
        _sds(tpu_sharding, (2, 4097, 4097))).compile()


def test_render_kernel_compiles(tpu_sharding):
    from esp32_fluid_simulation_tpu.render.pallas_upscale import (
        render_rgb565_pallas)
    for impl in ("planes", "transpose"):
        # padded path (odd + tiny shapes) and clamped pad-free path
        jax.jit(lambda c: render_rgb565_pallas(c, 4, impl=impl)).lower(
            _sds(tpu_sharding, (3, 257, 257))).compile()
        jax.jit(lambda c: render_rgb565_pallas(c, 4, impl=impl)).lower(
            _sds(tpu_sharding, (3, 61, 81))).compile()
        jax.jit(lambda c: render_rgb565_pallas(
            c, 4, tile_h=64, tile_w=512, impl=impl)).lower(
            _sds(tpu_sharding, (3, 1025, 1025))).compile()


def test_advect3d_kernel_compiles(tpu_sharding):
    from esp32_fluid_simulation_tpu.ops.pallas.advect3d import advect3d_pallas
    jax.jit(lambda f, v: advect3d_pallas(f, v, 1 / 30., True, 4)).lower(
        _sds(tpu_sharding, (3, 128, 256, 256)),
        _sds(tpu_sharding, (3, 128, 256, 256))).compile()


def test_sor3d_kernel_compiles(tpu_sharding):
    from esp32_fluid_simulation_tpu.ops.pallas.sor3d import sor3d_packed_pallas
    # production 256^3 config (chunked; default tiles) + an odd shape
    jax.jit(lambda d: sor3d_packed_pallas(d, 1.0, 6, 1.5)).lower(
        _sds(tpu_sharding, (256, 256, 256))).compile()
    jax.jit(lambda d: sor3d_packed_pallas(
        d, 1.0, 4, 1.5, chunk=2, tile_d=8, tile_h=16, tile_w=128)).lower(
        _sds(tpu_sharding, (33, 33, 33))).compile()


def test_smoke_mip_kernel_compiles(tpu_sharding):
    from esp32_fluid_simulation_tpu.render.pallas_smoke import (
        render_smoke_mip_pallas)
    # the PRODUCTION dispatch from render_smoke: default tiles, bf16
    # density (SmokeConfig default) — the uint16 output packs (16, 128)
    # native tiles, so the default tile height must round up to 16 (a
    # th=8 window was the round-5 hazard this gate now pins), f32 too
    for dt in (jnp.bfloat16, jnp.float32):
        jax.jit(lambda d: render_smoke_mip_pallas(d)).lower(
            _sds(tpu_sharding, (256, 256, 256), dt)).compile()
    # non-tile-aligned H/W
    jax.jit(lambda d: render_smoke_mip_pallas(d)).lower(
        _sds(tpu_sharding, (33, 49, 130), jnp.bfloat16)).compile()


def test_fd3d_kernels_compile(tpu_sharding):
    from esp32_fluid_simulation_tpu.ops.pallas.fd3d import (
        divergence3d_pallas, subtract_gradient3d_pallas)
    jax.jit(lambda v: divergence3d_pallas(v, 1.0)).lower(
        _sds(tpu_sharding, (3, 256, 256, 256))).compile()
    jax.jit(lambda v, p: subtract_gradient3d_pallas(v, p, 1.0)).lower(
        _sds(tpu_sharding, (3, 256, 256, 256)),
        _sds(tpu_sharding, (256, 256, 256))).compile()
