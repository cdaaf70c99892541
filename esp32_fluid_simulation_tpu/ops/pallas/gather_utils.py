"""Wide lane-gather for Mosaic kernels.

``tpu.dynamic_gather`` (the lowering of ``jnp.take_along_axis`` on lanes)
requires the gather source to be a SINGLE vreg along the gather dimension —
128 lanes.  ``lane_gather`` lifts that to arbitrary widths by static panel
decomposition: each 128-lane output panel gathers from each candidate
128-lane source panel with the index taken mod 128, and the results are
select-merged by the index's panel number.  When the caller knows the
gather is local (advection: indices within ``±max_disp+1`` of the output
position; upscale: ``j//s``), ``band``/``q_base`` restrict the candidate
panels to the statically-known overlap set instead of all of them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PANEL = 128


def lane_gather(src: jax.Array, idx: jax.Array, q_base=None, band=None):
    """out[i, j] = src[i, idx[i, j]].

    src: ``(rows, w_src)`` with ``w_src`` a multiple of 128;
    idx: ``(rows, w_out)`` int32, values in ``[0, w_src)``, ``w_out`` a
    multiple of 128;
    q_base(po) -> first candidate source panel for output panel ``po``
    (default 0); band: number of candidate panels (default: all).
    """
    rows, w_src = src.shape
    _, w_out = idx.shape
    n_src = w_src // PANEL
    n_out = w_out // PANEL
    if band is None:
        band = n_src
    out_panels = []
    for po in range(n_out):
        idx_p = idx[:, po * PANEL:(po + 1) * PANEL]
        div = idx_p // PANEL
        mod = idx_p - div * PANEL
        acc = jnp.zeros((rows, PANEL), src.dtype)
        q0 = 0 if q_base is None else q_base(po)
        for q in range(q0, min(q0 + band, n_src)):
            panel = src[:, q * PANEL:(q + 1) * PANEL]
            g = jnp.take_along_axis(panel, mod, axis=1)
            acc = acc + jnp.where(div == q, g, jnp.zeros_like(g))
        out_panels.append(acc)
    return jnp.concatenate(out_panels, axis=1) if n_out > 1 else out_panels[0]
