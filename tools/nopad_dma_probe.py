"""Probe: can Mosaic DMA clamped/conditional halo windows straight from an
UNPADDED HBM field?  (The fpad elimination lever, docs/PERFORMANCE.md
"Roofline position" — ~0.9 ms of pure pad copies per step at 4096^2.)

Checks, on the real backend:
  1. compile: 3x3 patchwork of conditional `make_async_copy`s with traced
     row starts `r*th - pr` (affine, 8-mult coefficients) and lane starts
     `c*tw - 64` (64-mult, NOT 128-mult) under pl.when guards;
  2. exactness: kernel re-emits its loaded window interior; compare to the
     fpad + single-DMA reference;
  3. timing: patchwork vs single-DMA-from-padded including the pad cost.

Run: python tools/nopad_dma_probe.py [H W]
"""
import sys
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from esp32_fluid_simulation_tpu.utils.profiling import chain_time  # noqa: E402

TH, TW = 64, 1024
PR, LH = 16, 64


def _patch_dma(field, dst, sem, i, nc, npr):
    """Return (starts, waits): lists of thunks for the 3x3 patchwork."""
    rr = i // nc
    cc = jax.lax.rem(i, nc)
    r0 = rr * TH
    c0 = cc * TW
    ww = TW + 2 * LH
    # (row window slice, field row start, rows, condition)
    rbands = [
        (0, r0 - PR, PR, rr > 0),
        (PR, r0, TH, None),
        (PR + TH, r0 + TH, PR, rr < npr - 1),
    ]
    lbands = [
        (0, c0 - LH, LH, cc > 0),
        (LH, c0, TW, None),
        (LH + TW, c0 + TW, LH, cc < nc - 1),
    ]
    out = []
    for bi, (wr, fr, nr_, rcond) in enumerate(rbands):
        for bj, (wl, fl, ncl, ccond) in enumerate(lbands):
            cond = None
            for c_ in (rcond, ccond):
                if c_ is not None:
                    cond = c_ if cond is None else jnp.logical_and(cond, c_)
            cp = pltpu.make_async_copy(
                field.at[:, pl.ds(fr, nr_), pl.ds(fl, ncl)],
                dst.at[:, pl.ds(wr, nr_), pl.ds(wl, ncl)],
                sem.at[bi, bj])
            out.append((cond, cp))
    return out


def _kernel_nopad(field_hbm, out_ref, win, sem, *, nc, npr):
    r = pl.program_id(0)
    c = pl.program_id(1)
    i = r * nc + c
    patches = _patch_dma(field_hbm, win, sem, i, nc, npr)
    for cond, cp in patches:
        if cond is None:
            cp.start()
        else:
            @pl.when(cond)
            def _(cp=cp):
                cp.start()
    for cond, cp in patches:
        if cond is None:
            cp.wait()
        else:
            @pl.when(cond)
            def _(cp=cp):
                cp.wait()
    # zero skipped strips (edge programs only), as the advect kernel would
    @pl.when(r == 0)
    def _():
        win[:, 0:PR, :] = jnp.zeros((2, PR, TW + 2 * LH), win.dtype)
    @pl.when(r == npr - 1)
    def _():
        win[:, PR + TH:, :] = jnp.zeros((2, PR, TW + 2 * LH), win.dtype)
    @pl.when(c == 0)
    def _():
        win[:, :, 0:LH] = jnp.zeros((2, TH + 2 * PR, LH), win.dtype)
    @pl.when(c == nc - 1)
    def _():
        win[:, :, LH + TW:] = jnp.zeros((2, TH + 2 * PR, LH), win.dtype)
    # checksum the WHOLE window (interior + halos) so exactness covers halos:
    # out tile = window interior + sum of halo strips broadcast
    halo_sum = (jnp.sum(win[1]) + jnp.sum(win[0, :PR, :])
                + jnp.sum(win[0, PR + TH:, :]) + jnp.sum(win[0, :, :LH])
                + jnp.sum(win[0, :, LH + TW:]))
    out_ref[0] = win[0, PR:PR + TH, LH:LH + TW] + halo_sum
    out_ref[1] = win[1, PR:PR + TH, LH:LH + TW]


def _kernel_padded(field_hbm, out_ref, win, sem, *, nc, npr):
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


@functools.partial(jax.jit, static_argnames=())
def run_nopad(x):
    h, w = x.shape[1], x.shape[2]
    npr, nc = h // TH, w // TW
    return pl.pallas_call(
        functools.partial(_kernel_nopad, nc=nc, npr=npr),
        grid=(npr, nc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2, TH, TW), lambda r, c: (0, r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, TH + 2 * PR, TW + 2 * LH), x.dtype),
                        pltpu.SemaphoreType.DMA((3, 3))],
    )(x)


@functools.partial(jax.jit, static_argnames=())
def run_padded(x):
    h, w = x.shape[1], x.shape[2]
    npr, nc = h // TH, w // TW
    xp = jax.lax.dynamic_update_slice(
        jnp.zeros((2, h + 2 * PR, w + 2 * LH), x.dtype), x, (0, PR, LH))
    return pl.pallas_call(
        functools.partial(_kernel_padded, nc=nc, npr=npr),
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
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, h, w), jnp.float32)

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
