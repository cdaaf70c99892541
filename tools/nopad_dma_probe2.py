"""Bisect which clamped-window DMA construct Mosaic rejects."""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 64, 1024
PR, LH = 16, 64
H, W = 1024, 2048  # small grid for fast compiles


def make(variant):
    def kern(field_hbm, out_ref, win, sem):
        r = pl.program_id(0)
        c = pl.program_id(1)
        nc = pl.num_programs(1)
        if variant == "a":      # row start r*TH - PR, direct program_id
            src = field_hbm.at[:, pl.ds(r * TH - PR, PR), pl.ds(c * TW, TW)]
            dst = win.at[:, pl.ds(0, PR), pl.ds(LH, TW)]
            cond = r > 0
        elif variant == "b":    # same but r from linear-index floor_div
            i = r * nc + c
            rr = i // nc
            src = field_hbm.at[:, pl.ds(rr * TH - PR, PR), pl.ds(c * TW, TW)]
            dst = win.at[:, pl.ds(0, PR), pl.ds(LH, TW)]
            cond = rr > 0
        elif variant == "c":    # lane start c*TW - LH (64-mult, not 128)
            src = field_hbm.at[:, pl.ds(r * TH, TH), pl.ds(c * TW - LH, LH)]
            dst = win.at[:, pl.ds(PR, TH), pl.ds(0, LH)]
            cond = c > 0
        elif variant == "d":    # corner: both offsets
            src = field_hbm.at[:, pl.ds(r * TH - PR, PR),
                               pl.ds(c * TW - LH, LH)]
            dst = win.at[:, pl.ds(0, PR), pl.ds(0, LH)]
            cond = (r > 0) & (c > 0)
        elif variant == "e":    # row start via explicit 8* factoring
            k = r * (TH // 8) - PR // 8
            src = field_hbm.at[:, pl.ds(k * 8, PR), pl.ds(c * TW, TW)]
            dst = win.at[:, pl.ds(0, PR), pl.ds(LH, TW)]
            cond = r > 0
        cp = pltpu.make_async_copy(src, dst, sem)

        @pl.when(cond)
        def _():
            cp.start()

        @pl.when(cond)
        def _():
            cp.wait()
        out_ref[...] = jnp.full(out_ref.shape, win[0, PR, LH], out_ref.dtype)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(H // TH, W // TW),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((2, TH, TW), lambda r, c: (0, r, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, H, W), x.dtype),
            scratch_shapes=[pltpu.VMEM((2, TH + 2 * PR, TW + 2 * LH),
                                       x.dtype),
                            pltpu.SemaphoreType.DMA],
        )(x)
    return run


x = jnp.ones((2, H, W), jnp.float32)
for v in "abcde":
    try:
        make(v)(x).block_until_ready()
        print(f"variant {v}: OK", flush=True)
    except Exception as ex:
        msg = str(ex)
        key = [ln for ln in msg.splitlines() if "Mosaic" in ln or
               "divisible" in ln or "prove" in ln]
        print(f"variant {v}: FAIL  {key[:2]}", flush=True)
