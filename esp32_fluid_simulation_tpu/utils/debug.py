"""Debug-mode step: ``checkify``-instrumented NaN/Inf localization.

SURVEY.md §5 (race detection / sanitizers): the float-world equivalent of a
sanitizer.  The watchdog (``utils/watchdog.py``) detects-and-recovers in
production; this wrapper instead *localizes* the first non-finite value to
the op that produced it, for debugging blowups (e.g. omega=1.96 with a
violated dt/forcing envelope).
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import checkify

from ..config import SimConfig
from ..models.stable_fluids import step


def make_checked_step(cfg: SimConfig):
    """Returns ``checked(state, impulses) -> (error, new_state)``; call
    ``error.throw()`` (or inspect ``error.get()``) after the step.

    Instruments every primitive with float checks — significant overhead;
    debug runs only.
    """
    fn = checkify.checkify(
        functools.partial(step, cfg=cfg),
        errors=checkify.float_checks,
    )
    return jax.jit(fn)
