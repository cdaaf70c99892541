"""On-device render: separable bilinear upscale + RGB565 pack.

Capability match for the reference's ``draw_routine`` (``.ino:99-191``),
which upscales the (H-1)x(W-1) cell grid 4x to 320x240 by incremental
separable bilinear interpolation (``.ino:128-162``) and packs
``Vector3<UQ32>`` to RGB565 by masking the top 5/6/5 bits of each 32-bit
channel plus a byte swap for SPI order (``.ino:164-176``).

TPU-first design: the reference's per-pixel incremental ``c += dc`` strength
reduction is a scalar-CPU trick; here the same separable bilinear math is two
broadcasted lerps (one fused XLA pass), and the whole render runs on device
so only final packed pixels ever cross to the host (the BASELINE north-star
requirement).  The last node row/column are lerp endpoints with no screen
area (``.ino:115``), hence the output is ``((H-1)*s, (W-1)*s)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def upscale_bilinear(color: jax.Array, s: int) -> jax.Array:
    """Bilinear-upsample ``[C, H, W] -> [C, (H-1)*s, (W-1)*s]``.

    Output pixel ``(i*s + a, j*s + b)`` is the bilinear blend of nodes
    ``{i,i+1}x{j,j+1}`` at fractions ``(a/s, b/s)`` — identical math to the
    reference's incremental lerps (``.ino:128-162``) without the serial
    accumulation.
    """
    if s == 1:
        return color[:, :-1, :-1]
    c = color.astype(jnp.float32)
    ch, h, w = c.shape
    t = (jnp.arange(s, dtype=jnp.float32) / s)
    # Rows: lerp node rows i and i+1 at fractions t -> [C, H-1, s, W]
    r0 = c[:, :-1, :][:, :, None, :]
    r1 = c[:, 1:, :][:, :, None, :]
    tr = t[None, None, :, None]
    rows = r0 * (1 - tr) + r1 * tr
    rows = rows.reshape(ch, (h - 1) * s, w)
    # Cols: lerp node cols j and j+1 at fractions t -> [C, (H-1)s, W-1, s]
    c0 = rows[:, :, :-1][:, :, :, None]
    c1 = rows[:, :, 1:][:, :, :, None]
    tc = t[None, None, None, :]
    out = c0 * (1 - tc) + c1 * tc
    return out.reshape(ch, (h - 1) * s, (w - 1) * s)


def pack_rgb565(rgb: jax.Array, bswap: bool = True) -> jax.Array:
    """Pack ``[3, H, W]`` unit floats to uint16 RGB565.

    The reference keeps the top 5/6/5 bits of each UQ32 channel
    (``.ino:170-172``): for a unit float ``c`` that is ``floor(c * 2^k)``
    clipped to ``2^k - 1``.  ``bswap`` reproduces ``__builtin_bswap16``
    (``.ino:173``), the SPI byte order of the LCD path.
    """
    def chan(c, bits):
        # cast-then-clip is result-identical to the reference's
        # floor-then-clip for every finite input (truncation vs floor only
        # differ on negatives, which clip to 0 either way)
        q = (c.astype(jnp.float32) * (1 << bits)).astype(jnp.int32)
        return jnp.clip(q, 0, (1 << bits) - 1)

    r = chan(rgb[0], 5)
    g = chan(rgb[1], 6)
    b = chan(rgb[2], 5)
    word = (r << 11) | (g << 5) | b
    if bswap:
        word = ((word << 8) | (word >> 8)) & 0xFFFF
    return word.astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("s", "bswap", "unit_range"))
def render_rgb565(color: jax.Array, s: int = 4, bswap: bool = True,
                  unit_range: bool = False):
    """Full on-device render: upscale + RGB565 pack.

    Large upscales on TPU dispatch to the fused Pallas kernel
    (``render.pallas_upscale``, bit-exact vs this path and ~3.5x faster at
    4096^2 -> 16384^2: only uint16 pixels touch HBM).

    ``unit_range=True`` asserts ``color`` lies in [0, 1] — true for any
    stepped state of a ``semilag``/``rk2`` config, whose dye is clamped
    every step (``models.stable_fluids.step``), and for ``init_state``
    output — and lets the kernel drop the per-pixel lower clip.  Bit-exact
    for in-range inputs; out-of-range inputs render differently."""
    h, w = color.shape[-2], color.shape[-1]
    if (s > 1 and jax.default_backend() == "tpu"
            and (h - 1) * (w - 1) * s * s >= 1_000_000):
        from .pallas_upscale import render_rgb565_pallas
        return render_rgb565_pallas(color, s=s, bswap=bswap,
                                    unit_range=unit_range)
    return pack_rgb565(upscale_bilinear(color, s), bswap=bswap)


render_rgb8 = jax.jit(
    lambda color, s=4: jnp.clip(
        jnp.floor(upscale_bilinear(color, s) * 256.0), 0, 255
    ).astype(jnp.uint8),
    static_argnames=("s",),
)
render_rgb8.__doc__ = """RGB888 render for host-side demo output (PNG/PPM)."""


@functools.partial(jax.jit, static_argnames=("d",))
def decimate_mean(color: jax.Array, d: int) -> jax.Array:
    """d:1 mean-pool of ``[C, H, W]`` for the stream view (the LCD is
    smaller than the sim; the reference upscales, production grids
    downsample).

    Implementation note (round 5): a plain ``[:, ::d, ::d]`` strided slice
    is catastrophic on TPU — measured 166 ms on a bf16 [3, 4096, 4096]
    (it silently capped the interactive shell at ~12 FPS); XLA's
    reduce_window is 24 ms (f32) / 3.7 s (bf16-add).  Two slice-add passes
    (rows, then lanes on the already-halved array) run at 6.5 ms and
    anti-alias for free.

    Non-divisible dims are cropped to the largest d-multiple first (the
    reference's own 61x81 grid divides by nothing; the old strided slice
    accepted any d and this must too)."""
    if d == 1:
        return color
    _, h, w = color.shape
    hc, wc = (h // d) * d, (w // d) * d
    if hc == 0 or wc == 0:
        raise ValueError(f"decimation {d} exceeds grid {h}x{w}")
    color = color[:, :hc, :wc]
    r = color[:, 0::d]
    for i in range(1, d):
        r = r + color[:, i::d]
    out = r[:, :, 0::d]
    for i in range(1, d):
        out = out + r[:, :, i::d]
    return (out * jnp.asarray(1.0 / (d * d), jnp.float32).astype(out.dtype))


@functools.partial(jax.jit, static_argnames=("s",))
def render_rgbx(color: jax.Array, s: int = 4) -> jax.Array:
    """Packed RGBX8888 render: one uint32/px, little-endian R|G<<8|B<<16.

    Full-color alternative wire format for the MJPEG stream: a
    ``[H, W, 3]`` uint8 device output pads its size-3 minor axis to 128
    TPU lanes (~42x layout blowup — measured as a 42 -> 12 FPS sim
    collapse at 4096^2, round 5), while one uint32 plane keeps the natural
    (8, 128) tiling; the native encoder consumes the 4-byte pixels
    directly (libjpeg-turbo JCS_EXT_RGBX).  The server's default wire
    format is RGB565 (half the device->host bytes, the reference's own
    display format, .ino:164-176); use this one when the stream must be
    8-bit lossless per channel.  Channel quantization matches
    ``render_rgb8`` exactly (same bytes)."""
    up = upscale_bilinear(color, s)

    def q(c):
        return jnp.clip(jnp.floor(c * 256.0), 0, 255).astype(jnp.uint32)

    return q(up[0]) | (q(up[1]) << 8) | (q(up[2]) << 16)
