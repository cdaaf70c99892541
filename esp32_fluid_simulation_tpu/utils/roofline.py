"""Roofline estimator: speed-of-light step time for a config on a TPU.

The simulation is HBM-bandwidth-bound (stencils and gathers do a handful of
flops per float); the roofline is therefore bytes-per-step / HBM bandwidth.
This module itemizes the per-step traffic of each op under the two
implementation paths and converts to an ideal FPS — the yardstick every
kernel optimization is measured against (and the basis of the claims in
docs/PERFORMANCE.md).

Composed-jnp path: every op round-trips its operands through HBM.
Fused-kernel path: advection reads field+vel once and writes once
(plus the halo-overlap factor); the fused projection reads the velocity
window once and writes velocity+pressure; render writes only uint16 pixels.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

from ..config import SimConfig


@dataclasses.dataclass(frozen=True)
class TpuSpec:
    name: str
    hbm_gbps: float          # HBM bandwidth, GB/s
    vpu_tops: float          # vector unit, f32 Top/s (order of magnitude)


TPU_SPECS = {
    "v5e": TpuSpec("v5e", 819.0, 4.0),
    "v5p": TpuSpec("v5p", 2765.0, 12.0),
    "v6e": TpuSpec("v6e", 1640.0, 8.0),
}


def _bytes(cfg: SimConfig, channels: int = 1) -> int:
    n = 1
    for s in cfg.shape:
        n *= s
    itemsize = 2 if cfg.dtype == "bfloat16" else 4
    return n * channels * itemsize


def step_traffic_bytes(cfg: SimConfig, fused: bool) -> Dict[str, float]:
    """Estimated HBM bytes per step, itemized per stage."""
    nd = cfg.ndim
    vel = _bytes(cfg, nd)
    scal = _bytes(cfg, 1)
    col_item = 2 if cfg.color_dtype == "bfloat16" else 4
    col = _bytes(cfg, 3) * col_item // (2 if cfg.dtype == "bfloat16" else 4)
    halo_overlap = 1.15  # tile halo re-reads in the fused kernels

    t = {}
    if fused:
        # pallas advect: read vel (backtrace input) + field window + write
        t["advect_vel"] = (vel + vel * halo_overlap + vel)
        t["advect_color"] = (vel + col * halo_overlap + col)
        # fused projection: read vel window, write vel + pressure
        t["projection"] = vel * halo_overlap + vel + scal
    else:
        # composed: advect does gather reads ~4 corners amortized to ~2x
        t["advect_vel"] = vel * 3 + vel
        t["advect_color"] = vel + col * 3 + col
        # divergence (r vel, w div) + 2*iters half-sweeps (r p,d; w p) + grad
        t["projection"] = (vel + scal) \
            + 2 * cfg.sor_iters * (3 * scal) + (vel + scal + vel)
    # render: read color (+ write uint16 pixels)
    px = 1
    for s in cfg.render_shape:
        px *= s
    t["render"] = col * (halo_overlap if fused else 2.5) + px * 2
    return t


def speed_of_light(cfg: SimConfig, tpu: str = "v5e",
                   fused: bool = True) -> Dict[str, float]:
    """Ideal step time / FPS on ``tpu`` for this config."""
    spec = TPU_SPECS[tpu]
    traffic = step_traffic_bytes(cfg, fused)
    total = sum(traffic.values())
    ms = total / (spec.hbm_gbps * 1e9) * 1e3
    return {
        "tpu": tpu,
        "fused": fused,
        "bytes_per_step": total,
        "ideal_ms_per_step": ms,
        "ideal_fps": 1e3 / ms if ms > 0 else float("inf"),
        "per_stage_bytes": traffic,
    }
