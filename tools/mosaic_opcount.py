"""Static Mosaic op-count profiler: a chip-free VPU-work proxy.

Lowers a jitted function AOT for v5e (no device or tunnel needed), decodes
the ``tpu_custom_call`` backend_config's MLIR bytecode back to text with the
tpu dialect registered, and tallies vector/arith/math/tpu op mnemonics.
Counts are per *tile program* (one grid step), with every statically
unrolled branch included — runtime-gated ``pl.when`` bodies count even when
a real run skips them — so treat deltas between two formulations of the
same kernel as the signal, not absolute cost.  This is how the round-3
one-hot-select advect restructure was sized while the TPU tunnel was down
(docs/PERFORMANCE.md "Roofline position").

  python tools/mosaic_opcount.py advect      # per-kernel presets
  python tools/mosaic_opcount.py render
  python tools/mosaic_opcount.py project
"""
from __future__ import annotations

import base64
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def _v5e_sharding():
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    return NamedSharding(Mesh(np.array(topo.devices[:1]).reshape(1), ("d",)),
                         P())


def mosaic_modules(fn, *arg_specs):
    """All Mosaic kernel bodies in ``jit(fn)`` lowered for v5e, as MLIR text."""
    sh = _v5e_sharding()
    specs = [jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh)
             for s in arg_specs]
    ir = jax.jit(fn).lower(*specs).as_text()
    texts = []
    for m in re.finditer(r'backend_config = "(.*?)"', ir, re.S):
        raw = re.sub(r"\\([0-9A-Fa-f]{2})",
                     lambda g: chr(int(g.group(1), 16)), m.group(1))
        try:
            cfg = json.loads(raw)
            body = base64.b64decode(cfg["custom_call_config"]["body"])
        except (ValueError, KeyError):
            continue
        from jax._src.lib.mlir import ir as mlir_ir
        ctx = mlir_ir.Context()
        ctx.allow_unregistered_dialects = True
        from jaxlib.mosaic.python import tpu
        tpu.register_dialect(ctx)
        texts.append(str(mlir_ir.Module.parse(body, ctx)))
    return texts


def op_counts(fn, *arg_specs):
    """Counter of vector/arith/math/tpu mnemonics over all Mosaic kernels."""
    ops = collections.Counter()
    for t in mosaic_modules(fn, *arg_specs):
        ops.update(re.findall(r"(?:vector|tpu|arith|math)\.[a-z_0-9.]+", t))
    return ops


def report(label, ops, top=12):
    tot = sum(ops.values())
    gath = sum(v for k, v in ops.items() if "gather" in k)
    sel = sum(v for k, v in ops.items() if "select" in k)
    print(f"{label}: total={tot} gathers={gath} selects={sel}")
    for k, v in ops.most_common(top):
        print(f"   {k:28s} {v}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "advect"
    S = jax.ShapeDtypeStruct
    if which == "advect":
        from esp32_fluid_simulation_tpu.ops.pallas.advect import advect_pallas
        fn = lambda f, v: advect_pallas(f, v, 1 / 30., True, max_disp=12,
                                        tile_h=32, tile_w=1024)
        report("advect vel 2ch f32",
               op_counts(fn, S((2, 1024, 1024), jnp.float32),
                         S((2, 1024, 1024), jnp.float32)))
        fnd = lambda f, v: advect_pallas(f, v, 1 / 30., False, max_disp=12,
                                         tile_h=32, tile_w=1024, clip01=True)
        report("advect dye 3ch bf16",
               op_counts(fnd, S((3, 1024, 1024), jnp.bfloat16),
                         S((2, 1024, 1024), jnp.float32)))
    elif which == "render":
        from esp32_fluid_simulation_tpu.render.pallas_upscale import (
            render_rgb565_pallas)
        for impl in ("transpose", "planes"):
            fn = lambda c, impl=impl: render_rgb565_pallas(
                c, s=4, impl=impl, unit_range=True)
            report(f"render 4x {impl}",
                   op_counts(fn, S((3, 1025, 1025), jnp.bfloat16)))
    elif which == "project":
        from esp32_fluid_simulation_tpu.ops.pallas.project import (
            project_fused_pallas)
        fn = lambda v: project_fused_pallas(v, 1.0, 10, 1.96)[0]
        report("fused projection 10 iters",
               op_counts(fn, S((2, 1024, 1024), jnp.float32)))
    else:
        raise SystemExit(f"unknown preset {which!r}")


if __name__ == "__main__":
    main()
