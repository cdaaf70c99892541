"""Separable in-place triangular blur used by the initial condition.

The reference softens the RGB sector edges with two sequential in-place
[1/4, 1/2, 1/4] passes (``.ino:220-241``).  Because they run *in place*, each
cell's "previous" neighbor is the already-blurred value — a first-order
linear recurrence, not a convolution:

    out[0]   = 0.25*c[0]   + 0.5*c[0]   + 0.25*c[1]      (left ghost = center)
    out[j]   = 0.25*out[j-1] + 0.5*c[j] + 0.25*c[j+1]
    out[n-1] = 0.25*out[n-2] + 0.5*c[n-1] + 0.25*c[n-1]  (right ghost = center)

Implemented with ``lax.scan`` along the blur axis (init-time only — never on
the hot path), which reproduces the reference exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangular_blur_inplace(x: jax.Array, axis: int) -> jax.Array:
    """Apply the reference's sequential in-place [1/4,1/2,1/4] blur along
    ``axis`` (``.ino:220-241``)."""
    xm = jnp.moveaxis(x, axis, 0)
    c = xm
    right = jnp.concatenate([c[1:], c[-1:]], axis=0)  # c[j+1]; ghost = center
    g = 0.5 * c + 0.25 * right

    def body(prev, gj):
        out = 0.25 * prev + gj
        return out, out

    # Carry starts at c[0]: the j=0 "left" ghost is the (old) center value.
    _, outs = jax.lax.scan(body, c[0], g)
    return jnp.moveaxis(outs, 0, axis)
