"""Profiling helpers (SURVEY.md §5: the reference's author profiled with
gprof off-device; the TPU equivalents are jax.profiler traces and
dependency-chained wall timing).

``chain_time`` implements the timing methodology that survives async
dispatch AND runtimes whose ``block_until_ready`` is unreliable (e.g. the
tunneled PJRT backend this repo was developed against): chain n dependent
applications, force execution with a tiny fetch, and difference against a
1-iteration run.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf[..., :1, :1]))


def chain_time(fn: Callable, x0, n: int = 10) -> float:
    """Seconds per application of ``fn`` (x -> x), dependency-chained."""
    _sync(fn(x0))  # compile + settle

    def run(k):
        cur = x0
        t0 = time.time()
        for _ in range(k):
            cur = fn(cur)
        _sync(cur)
        return time.time() - t0

    t1 = run(1)
    tn = run(n)
    return max((tn - t1) / (n - 1), 1e-9)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
