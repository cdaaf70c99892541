"""Render tests: bilinear upscale + RGB565 pack vs the reference math."""

import numpy as np
import jax.numpy as jnp

from esp32_fluid_simulation_tpu.render import (upscale_bilinear, pack_rgb565,
                                               render_rgb565, render_rgb8)
from esp32_fluid_simulation_tpu.utils.uq32 import (float_to_uq32,
                                                   uq32_to_float,
                                                   uq32_top_bits)
import oracle

F = np.float32


def test_upscale_matches_oracle(rng):
    c = rng.random((3, 7, 9), dtype=F)
    got = np.asarray(upscale_bilinear(jnp.asarray(c), 4))
    want = oracle.upscale_bilinear(np.moveaxis(c, 0, -1), 4)
    np.testing.assert_allclose(got, np.moveaxis(want, -1, 0),
                               rtol=1e-5, atol=1e-6)


def test_upscale_shape_reference():
    c = jnp.zeros((3, 61, 81), F)
    out = upscale_bilinear(c, 4)
    assert out.shape == (3, 240, 320)  # .ino:36-38,115: endpoints drop out


def test_upscale_node_values_preserved(rng):
    c = rng.random((3, 5, 6), dtype=F)
    out = np.asarray(upscale_bilinear(jnp.asarray(c), 4))
    np.testing.assert_allclose(out[:, ::4, ::4], c[:, :-1, :-1], atol=1e-6)


def test_pack_rgb565_known_values():
    # pure red / green / blue / white at full intensity, no byte swap
    rgb = jnp.asarray(np.array([[[1.0]], [[0.0]], [[0.0]]], F))
    assert int(pack_rgb565(rgb, bswap=False)[0, 0]) == 0xF800
    rgb = jnp.asarray(np.array([[[0.0]], [[1.0]], [[0.0]]], F))
    assert int(pack_rgb565(rgb, bswap=False)[0, 0]) == 0x07E0
    rgb = jnp.asarray(np.array([[[0.0]], [[0.0]], [[1.0]]], F))
    assert int(pack_rgb565(rgb, bswap=False)[0, 0]) == 0x001F
    rgb = jnp.asarray(np.ones((3, 1, 1), F))
    assert int(pack_rgb565(rgb, bswap=False)[0, 0]) == 0xFFFF


def test_pack_rgb565_byteswap():
    rgb = jnp.asarray(np.array([[[1.0]], [[0.0]], [[0.0]]], F))
    plain = int(pack_rgb565(rgb, bswap=False)[0, 0])
    sw = int(pack_rgb565(rgb, bswap=True)[0, 0])
    assert sw == (((plain << 8) | (plain >> 8)) & 0xFFFF)


def test_pack_matches_uq32_oracle(rng):
    """Our float top-bit extraction equals the UQ32 masking route
    (.ino:170-172) for values away from quantization boundaries."""
    vals = rng.random((3, 8, 8)).astype(F)
    got = np.asarray(pack_rgb565(jnp.asarray(vals), bswap=True))
    want = oracle.pack_rgb565(np.moveaxis(vals, 0, -1), bswap=True)
    # tolerate off-by-one-LSB on exact bucket boundaries
    mismatch = got != want
    assert mismatch.mean() < 0.02


def test_render_jits_and_rgb8():
    c = jnp.asarray(np.random.default_rng(0).random((3, 61, 81)), F)
    frame = render_rgb565(c, s=4)
    assert frame.shape == (240, 320) and frame.dtype == jnp.uint16
    img = render_rgb8(c, s=4)
    assert img.shape == (3, 240, 320) and img.dtype == jnp.uint8


def test_render_rgb565_unit_range_pallas_dispatch(rng, monkeypatch):
    """render_rgb565(unit_range=...) through the TPU Pallas dispatch branch
    (forced on CPU via interpret mode): unit_range must be jit-static — a
    traced bool crashed the production render path (code-review r3) — and
    bit-exact vs the default for in-range dye."""
    import functools
    import jax
    from jax.experimental import pallas as pl
    from esp32_fluid_simulation_tpu.render import upscale as up
    monkeypatch.setattr(up.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    c = jnp.asarray(rng.random((3, 252, 252), dtype=F))  # >= 1e6 out pixels
    a = np.asarray(up.render_rgb565(c, s=4, unit_range=True))
    b = np.asarray(up.render_rgb565(c, s=4, unit_range=False))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1004, 1004)


def test_uq32_roundtrip(rng):
    x = rng.random(1000).astype(F)
    raw = float_to_uq32(x)
    back = uq32_to_float(raw)
    np.testing.assert_allclose(back, x, atol=2e-7)
    assert uq32_top_bits(np.uint32(0xF8000000), 5) == 0x1F
