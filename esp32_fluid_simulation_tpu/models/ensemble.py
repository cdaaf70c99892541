"""vmap-batched ensembles (BASELINE config 4: 256 independent 256^2 sims on
one chip for parameter sweeps).

Because the step is a pure function of a state pytree, batching is one
``jax.vmap`` — the reference's latent SPMD (SURVEY.md §2 "parallelism
strategies") made literal.  Members can differ in their impulse schedules
(the swept parameter); config stays shared so one XLA program serves the
whole ensemble.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import SimState, Impulses
from .stable_fluids import init_state, step


def init_ensemble(cfg: SimConfig, n: int) -> SimState:
    """n identical members (diverge via per-member impulses)."""
    s = init_state(cfg)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), s)


def stack_impulses(imps) -> Impulses:
    """[Impulses, ...] (one per member) -> batched Impulses."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *imps)


def make_ensemble_step(cfg: SimConfig, donate: bool = True):
    """Batched step: (SimState[n, ...], Impulses[n, ...]) -> SimState."""
    fn = jax.vmap(functools.partial(step, cfg=cfg))
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def tiled_ensemble_config(member_cfg: SimConfig, n: int,
                          solver: str = "fused_pallas"):
    """Supergrid config for n member domains (BASELINE config 4 at kernel
    speed): members become tiles of one big grid and every boundary
    condition acts per tile (``SimConfig.domain_tile``), so the whole
    ensemble advances in ONE kernel-path step instead of a vmapped batch of
    small programs.  Returns (supergrid_cfg, gh, gw)."""
    import dataclasses
    import math
    gh = int(math.sqrt(n))
    while n % gh:
        gh -= 1
    gw = n // gh
    h, w = member_cfg.shape
    return dataclasses.replace(
        member_cfg, shape=(gh * h, gw * w), domain_tile=(h, w),
        solver=solver), gh, gw


def tiled_member_impulses(cfg_super: SimConfig, member_cfg: SimConfig,
                          gh: int, gw: int, per_member) -> Impulses:
    """Per-member impulse lists -> one supergrid Impulses batch.

    ``per_member``: list of (pos_list, vel_list) per member (row-major over
    the (gh, gw) tile grid); positions are member-local and get offset to
    the member's tile origin.  The supergrid step applies at most
    ``cfg_super.max_impulses`` total — spread schedules across steps for
    dense forcing."""
    h, w = member_cfg.shape
    pos, vel = [], []
    for m, (ps, vs) in enumerate(per_member):
        oi, oj = (m // gw) * h, (m % gw) * w
        pos.extend((oi + p[0], oj + p[1]) for p in ps)
        vel.extend(vs)
    return Impulses.from_lists(cfg_super, pos, vel)
