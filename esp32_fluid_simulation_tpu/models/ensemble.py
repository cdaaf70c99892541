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
