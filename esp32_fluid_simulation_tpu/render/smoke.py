"""On-device 3D smoke visualization: axis slice / max-intensity projection
(MIP) + heat colormap + RGB565/RGB8 pack (VERDICT r4 next #8).

The 2D dye bed renders through ``render.upscale`` (the reference's
``draw_routine`` role, ``.ino:99-191``); the 3D plume has no reference
counterpart — its serving shape is a 2D view of the density volume with only
final packed pixels leaving the device, same contract as the 2D render.

Two reductions of the volume to a view plane:

* ``mode="slice"``: one plane ``density[index]`` along ``axis``;
* ``mode="mip"``:   ``max`` over ``axis`` — the standard smoke projection
  (order-independent, so the Pallas kernel is bit-identical to the jnp
  reference by construction).

The view maps through a fire-style piecewise-linear colormap
(t -> R saturates first, then G, then B — black→red→yellow→white) and packs
exactly like the 2D path (``render.upscale.pack_rgb565`` bit semantics).

On TPU, big MIP renders dispatch to the fused Pallas kernel
(``render.pallas_smoke``): one pass over the volume, only uint16 pixels
reach HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .upscale import pack_rgb565


def heat_colormap(t: jax.Array) -> jax.Array:
    """Unit-scale intensity -> [3, ...] RGB floats (fire ramp).

    r = min(3t, 1), g = min(3t-1, 1)+, b = min(3t-2, 1)+ — each channel a
    single fused mul/clamp, monotone, endpoint-exact (t=0 black, t=1
    white)."""
    t = t.astype(jnp.float32)
    r = jnp.clip(3.0 * t, 0.0, 1.0)
    g = jnp.clip(3.0 * t - 1.0, 0.0, 1.0)
    b = jnp.clip(3.0 * t - 2.0, 0.0, 1.0)
    return jnp.stack([r, g, b])


def _view(density: jax.Array, mode: str, axis: int, index):
    if mode == "mip":
        return jnp.max(density, axis=axis)
    if mode == "slice":
        n = density.shape[axis]
        idx = n // 2 if index is None else index
        return jax.lax.index_in_dim(density, idx, axis=axis, keepdims=False)
    raise ValueError(f"unknown mode {mode!r} (want 'mip' or 'slice')")


@functools.partial(jax.jit, static_argnames=("mode", "axis", "index", "fmt",
                                             "bswap", "vmax"))
def render_smoke(density: jax.Array, mode: str = "mip", axis: int = 0,
                 index: int | None = None, fmt: str = "rgb565",
                 bswap: bool = True, vmax: float = 1.0):
    """``[D, H, W]`` density -> packed 2D view.

    fmt="rgb565": uint16 ``[H', W']`` (the 2D render's wire format,
    ``.ino:164-176`` bit semantics); fmt="rgb8": uint8 ``[H', W', 3]`` for
    host-side PPM/PNG/GIF.  ``vmax`` rescales intensities (smoke density is
    source-clamped to [0, 1], so the default is exact).

    Large TPU MIPs dispatch to the fused Pallas kernel
    (``render.pallas_smoke.render_smoke_mip_pallas``, bit-exact: max is
    order-independent and the colormap/pack expressions are identical).
    """
    if density.ndim != 3:
        raise ValueError(f"density must be [D, H, W], got {density.shape}")
    if fmt not in ("rgb565", "rgb8"):
        raise ValueError(f"unknown fmt {fmt!r}")
    if (mode == "mip" and axis == 0 and fmt == "rgb565"
            and jax.default_backend() == "tpu"
            and density.shape[1] * density.shape[2] >= 128 * 128):
        from .pallas_smoke import render_smoke_mip_pallas
        return render_smoke_mip_pallas(density, bswap=bswap, vmax=vmax)
    view = _view(density, mode, axis, index)
    t = view.astype(jnp.float32) * jnp.float32(1.0 / vmax)
    rgb = heat_colormap(t)
    if fmt == "rgb565":
        return pack_rgb565(rgb, bswap=bswap)
    q = jnp.clip(jnp.floor(rgb * 256.0), 0, 255).astype(jnp.uint8)
    return jnp.moveaxis(q, 0, -1)
