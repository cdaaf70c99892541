"""Ablation probe for the panel advect kernel's cost structure at 4096^2.

Trimmed copy of ``_advect_kernel_panel`` (single-device, no minmax/member/
block mode) with components switchable per run.  NOT bit-exact in the
ablated modes — timing only.

modes:
  full      : the production pipeline (reference point)
  nogather  : take_along_axis replaced by a direct panel read
  onepanel  : only source panel po is gathered/selected (drops panel po+1)
  noops     : gathers kept, contrib/select weighting dropped (acc += g0)
  oneshift  : only shift s=0 runs (drops the occupancy loop)

  python tools/advect_ablate_probe.py
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esp32_fluid_simulation_tpu.ops.pallas.advect import (  # noqa: E402
    _PANEL_LH, _backtrace, _bitcast_f32, _bitcast_u32)
from esp32_fluid_simulation_tpu.utils.profiling import chain_time  # noqa: E402

LANE = 128


def _kernel(goff_ref, vel_ref, field_hbm, out_ref, src_vmem, acc_vmem, sem,
            *, dt, max_disp, tile_h, tile_w, pr, h, w, no_slip, pack, mode):
    n_ch = src_vmem.shape[0]
    ww = tile_w + 2 * _PANEL_LH
    r = pl.program_id(0)
    cidx = pl.program_id(1)
    row0 = r * tile_h
    col0 = cidx * tile_w

    dma = pltpu.make_async_copy(
        field_hbm.at[:, pl.ds(row0, tile_h + 2 * pr), pl.ds(col0, ww)],
        src_vmem, sem)
    dma.start()

    f32 = jnp.float32
    goff = (goff_ref[0, 0], goff_ref[0, 1])
    rel_i, (w_i0, w_i1), j0, dj, row_valid, ns_factor = _backtrace(
        vel_ref, row0, col0, dt=dt, max_disp=max_disp, tile_h=tile_h,
        tile_w=tile_w, h=h, w=w, no_slip=no_slip, goff=goff, bh=h,
        member=None)
    lj = (j0 - goff[1].astype(f32) - f32(col0 - _PANEL_LH)).astype(jnp.int32)
    dma.wait()

    wins = []
    for ch in range(n_ch):
        x = src_vmem[ch].astype(f32)
        if pack:
            if src_vmem.dtype != jnp.bfloat16:
                x = x.astype(jnp.bfloat16).astype(f32)
            nxt = pltpu.roll(x, ww - 1, 1)
            x = _bitcast_f32(_bitcast_u32(x) | (_bitcast_u32(nxt) >> 16))
        wins.append(x)

    acc_vmem[...] = jnp.zeros(acc_vmem.shape, f32)
    masked_rel = jnp.where(row_valid, rel_i, 0)

    n_out = tile_w // LANE
    for po in range(n_out):
        sl = slice(po * LANE, (po + 1) * LANE)
        rel_p = rel_i[:, sl]
        w0_p = w_i0[:, sl]
        w1_p = w_i1[:, sl]
        dj_p = dj[:, sl]
        lj_p = lj[:, sl]
        div_p = jnp.floor_divide(lj_p, LANE)
        mod_p = jnp.bitwise_and(lj_p, LANE - 1)
        e_q = [div_p == po, div_p == po + 1]
        if not pack:
            lj1_p = lj_p + 1
            div1_p = jnp.floor_divide(lj1_p, LANE)
            mod1_p = jnp.bitwise_and(lj1_p, LANE - 1)
            e1_q = [div1_p == po, div1_p == po + 1]
        one_m_dj = 1.0 - dj_p

        smin = jnp.min(masked_rel[:, sl])
        smax = jnp.max(masked_rel[:, sl])

        shifts = (0,) if mode == "oneshift" else range(-max_disp,
                                                       max_disp + 2)
        panels = (po,) if mode == "onepanel" else (po, po + 1)
        for s in shifts:
            @pl.when(jnp.logical_and(smin <= s, s <= smax + 1))
            def _(s=s, po=po, sl=sl):
                contrib = (jnp.where(rel_p == s, w0_p, 0.0)
                           + jnp.where(rel_p == s - 1, w1_p, 0.0))
                for ch in range(n_ch):
                    chsl = slice(ch * tile_h, (ch + 1) * tile_h)
                    rows_s = wins[ch][pr + s:pr + s + tile_h, :]
                    rv0 = jnp.zeros((tile_h, LANE), f32)
                    rv1 = jnp.zeros((tile_h, LANE), f32)
                    for qi, q in enumerate(panels):
                        pan = rows_s[:, q * LANE:(q + 1) * LANE]
                        if pack:
                            if mode == "nogather":
                                g = pan
                            else:
                                g = jnp.take_along_axis(pan, mod_p, axis=1)
                            gu = _bitcast_u32(g)
                            v0 = _bitcast_f32(gu & jnp.uint32(0xFFFF0000))
                            v1 = _bitcast_f32(gu << 16)
                            rv0 += jnp.where(e_q[qi], v0, 0.0)
                            rv1 += jnp.where(e_q[qi], v1, 0.0)
                        else:
                            if mode == "nogather":
                                g0 = pan
                                g1 = pan
                            else:
                                g0 = jnp.take_along_axis(pan, mod_p, axis=1)
                                g1 = jnp.take_along_axis(pan, mod1_p, axis=1)
                            if mode == "noops":
                                rv0 += g0
                                rv1 += g1
                            else:
                                rv0 += jnp.where(e_q[qi], g0, 0.0)
                                rv1 += jnp.where(e1_q[qi], g1, 0.0)
                    if mode == "noops":
                        acc_vmem[chsl, sl] += rv0 + rv1
                    else:
                        colv = rv0 * one_m_dj + rv1 * dj_p
                        acc_vmem[chsl, sl] += colv * contrib

    for ch in range(n_ch):
        a = acc_vmem[ch * tile_h:(ch + 1) * tile_h, :]
        if no_slip:
            a = a * ns_factor
        out_ref[ch, :, :] = a.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dt", "no_slip", "max_disp",
                                             "tile_h", "tile_w", "mode"))
def advect_probe(field, vel, dt, no_slip, max_disp=12, tile_h=32,
                 tile_w=1024, mode="full"):
    c, h, w = field.shape
    pr = pl.cdiv(max_disp + 1, 8) * 8
    th, tw = tile_h, tile_w
    hp = pl.cdiv(h, th) * th
    wp = pl.cdiv(w, tw) * tw
    lh = _PANEL_LH
    pack = field.dtype == jnp.bfloat16
    fpad = jnp.pad(field, ((0, 0), (pr, pr + hp - h), (lh, lh + wp - w)))
    vpad = jnp.pad(vel, ((0, 0), (0, hp - h), (0, wp - w)))
    goff = jnp.zeros((1, 2), jnp.int32)
    kernel = functools.partial(_kernel, dt=dt, max_disp=max_disp, tile_h=th,
                               tile_w=tw, pr=pr, h=h, w=w, no_slip=no_slip,
                               pack=pack, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=(hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((1, 2), lambda r, cl: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2, th, tw), lambda r, cl: (0, r, cl),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((c, th, tw), lambda r, cl: (0, r, cl),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), field.dtype),
        scratch_shapes=[pltpu.VMEM((c, th + 2 * pr, tw + 2 * lh),
                                   fpad.dtype),
                        pltpu.VMEM((c * th, tw), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(goff, vpad, fpad)
    return out[:, :h, :w]


def main():
    n = 4096
    key = jax.random.PRNGKey(0)
    # realistic smooth velocity (advection cost depends on shift occupancy)
    kv = jax.random.normal(key, (2, n // 32, n // 32), jnp.float32)
    vel = jax.image.resize(kv, (2, n, n), "bilinear") * 40.0
    vel = jax.block_until_ready(vel.astype(jnp.float32))
    f2 = jax.block_until_ready(
        jax.random.uniform(key, (2, n, n), jnp.float32))
    f3b = jax.block_until_ready(
        jax.random.uniform(key, (3, n, n), jnp.float32).astype(jnp.bfloat16))

    want_field = sys.argv[1] if len(sys.argv) > 1 else ""
    want_modes = sys.argv[2].split(",") if len(sys.argv) > 2 else (
        "full", "nogather", "onepanel", "noops", "oneshift")
    for name, field, ns in (("vel 2ch f32 noslip", f2, True),
                            ("dye 3ch bf16 pack ", f3b, False)):
        if want_field and want_field not in name:
            continue
        for mode in want_modes:
            def step(v, field=field, ns=ns, mode=mode):
                o = advect_probe(field, v, 1.0, ns, mode=mode)
                return v + o[:2, :1, :1].astype(jnp.float32) * 0.0 + (
                    o[0, 0, 0].astype(jnp.float32) * 1e-30)
            try:
                ts = [chain_time(step, vel, n=6) for _ in range(2)]
                print(f"{name} {mode:9s} min {min(ts)*1e3:6.2f} ms  "
                      f"{[round(t*1e3, 2) for t in ts]}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} {mode:9s} FAILED {type(e).__name__}: "
                      f"{str(e)[:90]}")


if __name__ == "__main__":
    main()
