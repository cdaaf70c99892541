"""Probe 3: realistic fpad-elimination scheme for the sloop advect window.

Scheme (probe2 findings: DMA lane slices must be 128-aligned AND
128-sized; row starts prove 8-divisibility only via explicit `8*k`
factoring or pl.multiple_of):

  * load a WIDE window [c0-128, c0+tw+128) x [r0-pr, r0+th+pr) as a 3x3
    patchwork of conditional DMAs from the UNPADDED field (9 semaphores);
  * zero-fill the skipped strips on edge programs;
  * restore the kernel's origin-64 layout with ONE pltpu.roll(-64) per
    channel (the sloop kernel already pays full-window rolls for
    wins_next, so this is in-family cost);
  * compare bit-exactness + time vs the DUS-pad + single-DMA reference.

Run: python tools/nopad_dma_probe3.py [H W]
"""
import sys
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from esp32_fluid_simulation_tpu.utils.profiling import chain_time  # noqa: E402

TH, TW = 64, 1024
PR, LH = 16, 64
WPAD = 128                       # wide-window lane halo (aligned)


def _row_start(k8):
    """8-factored row start: k8*8, provably 8-divisible."""
    return pl.multiple_of(k8 * 8, 8)


def start_window(field, dst, sem, i, nc, npr):
    """Issue the 3x3 patchwork for linear program index i into dst."""
    rr = i // nc
    cc = jax.lax.rem(i, nc)
    th8, pr8 = TH // 8, PR // 8
    twl, wpl = TW // 128, WPAD // 128
    lane = lambda k: pl.multiple_of(k * 128, 128)
    rbands = [  # (dst row off, src row start (8-factored), rows, cond)
        (0, _row_start(rr * th8 - pr8), PR, rr > 0),
        (PR, _row_start(rr * th8), TH, None),
        (PR + TH, _row_start(rr * th8 + th8), PR, rr < npr - 1),
    ]
    lbands = [  # (dst lane off, src lane start (128-factored), lanes, cond)
        (0, lane(cc * twl - wpl), WPAD, cc > 0),
        (WPAD, lane(cc * twl), TW, None),
        (WPAD + TW, lane(cc * twl + twl), WPAD, cc < nc - 1),
    ]
    ops = []
    for bi, (wr, fr, nr_, rc) in enumerate(rbands):
        for bj, (wl, fl, ncl, cc_) in enumerate(lbands):
            cond = None
            for c_ in (rc, cc_):
                if c_ is not None:
                    cond = c_ if cond is None else jnp.logical_and(cond, c_)
            cp = pltpu.make_async_copy(
                field.at[:, pl.ds(fr, nr_), pl.ds(fl, ncl)],
                dst.at[:, pl.ds(wr, nr_), pl.ds(wl, ncl)],
                sem.at[bi, bj])
            ops.append((cond, cp))
    return ops


def run_patch_ops(ops, what):
    for cond, cp in ops:
        fn = getattr(cp, what)
        if cond is None:
            fn()
        else:
            pl.when(cond)(fn)


def _kernel_nopad(field_hbm, out_ref, win, sem):
    r = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    npr = pl.num_programs(0)
    i = r * nc + c
    ops = start_window(field_hbm, win, sem, i, nc, npr)
    run_patch_ops(ops, "start")
    run_patch_ops(ops, "wait")
    wide = TW + 2 * WPAD

    @pl.when(r == 0)
    def _():
        win[:, 0:PR, :] = jnp.zeros((2, PR, wide), win.dtype)

    @pl.when(r == npr - 1)
    def _():
        win[:, PR + TH:, :] = jnp.zeros((2, PR, wide), win.dtype)

    @pl.when(c == 0)
    def _():
        win[:, :, 0:WPAD] = jnp.zeros((2, TH + 2 * PR, WPAD), win.dtype)

    @pl.when(c == nc - 1)
    def _():
        win[:, :, WPAD + TW:] = jnp.zeros((2, TH + 2 * PR, WPAD), win.dtype)

    ww = TW + 2 * LH
    outs = []
    for ch in range(2):
        # origin-64 view: field col g at lane g - c0 + 64  ==
        # wide lanes rolled left by (WPAD - LH) then cropped to ww
        x = pltpu.roll(win[ch], (TW + 2 * WPAD) - (WPAD - LH), 1)[:, :ww]
        outs.append(x)
    halo_sum = (jnp.sum(outs[1]) + jnp.sum(outs[0][:PR, :])
                + jnp.sum(outs[0][PR + TH:, :]) + jnp.sum(outs[0][:, :LH])
                + jnp.sum(outs[0][:, LH + TW:]))
    out_ref[0] = outs[0][PR:PR + TH, LH:LH + TW] + halo_sum
    out_ref[1] = outs[1][PR:PR + TH, LH:LH + TW]


def _kernel_padded(field_hbm, out_ref, win, sem):
    r = pl.program_id(0)
    c = pl.program_id(1)
    cp = pltpu.make_async_copy(
        field_hbm.at[:, pl.ds(r * TH, TH + 2 * PR),
                     pl.ds(c * TW, TW + 2 * LH)],
        win, sem)
    cp.start()
    cp.wait()
    halo_sum = (jnp.sum(win[1]) + jnp.sum(win[0, :PR, :])
                + jnp.sum(win[0, PR + TH:, :]) + jnp.sum(win[0, :, :LH])
                + jnp.sum(win[0, :, LH + TW:]))
    out_ref[0] = win[0, PR:PR + TH, LH:LH + TW] + halo_sum
    out_ref[1] = win[1, PR:PR + TH, LH:LH + TW]


@jax.jit
def run_nopad(x):
    h, w = x.shape[1], x.shape[2]
    npr, nc = h // TH, w // TW
    return pl.pallas_call(
        _kernel_nopad,
        grid=(npr, nc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2, TH, TW), lambda r, c: (0, r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, TH + 2 * PR, TW + 2 * WPAD), x.dtype),
                        pltpu.SemaphoreType.DMA((3, 3))],
    )(x)


@jax.jit
def run_padded(x):
    h, w = x.shape[1], x.shape[2]
    npr, nc = h // TH, w // TW
    xp = jax.lax.dynamic_update_slice(
        jnp.zeros((2, h + 2 * PR, w + 2 * LH), x.dtype), x, (0, PR, LH))
    return pl.pallas_call(
        _kernel_padded,
        grid=(npr, nc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2, TH, TW), lambda r, c: (0, r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, TH + 2 * PR, TW + 2 * LH), x.dtype),
                        pltpu.SemaphoreType.DMA],
    )(xp)


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w), jnp.float32)

    print("compiling nopad ...", flush=True)
    a = jax.block_until_ready(run_nopad(x))
    print("compiling padded ...", flush=True)
    b = jax.block_until_ready(run_padded(x))
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"maxabs(nopad - padded) = {d}")
    t_np = chain_time(run_nopad, x, n=30)
    t_pd = chain_time(run_padded, x, n=30)
    print(f"nopad  : {t_np * 1e3:8.3f} ms")
    print(f"padded : {t_pd * 1e3:8.3f} ms  (incl. DUS pad)")


if __name__ == "__main__":
    main()
