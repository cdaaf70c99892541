"""Structured per-step metrics (SURVEY.md §5: the reference has no
observability at all, not even Serial.print; the dev harness dumped whole
fields instead).

Metrics are computed ON DEVICE inside ``step_with_metrics`` (divergence
extrema pre/post projection, Poisson residual norm, max speed, finiteness)
and fetched lazily here; the logger writes JSON lines a row per step.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np
import jax


class MetricsLogger:
    """Append-only JSONL metrics log with lazy device fetches.

    ``log`` accepts the device-side metrics dict from
    ``make_step_with_metrics``; values are fetched in one batch.
    """

    def __init__(self, path: Optional[str] = None, every: int = 1):
        self.path = path
        self.every = max(1, every)
        self._fh = open(path, "a") if path else None
        self.history = []

    def log(self, step: int, metrics: Dict, extra: Optional[Dict] = None):
        if step % self.every:
            return None
        fetched = jax.device_get(metrics)
        row = {"step": int(step), "time": time.time()}
        for k, v in fetched.items():
            a = np.asarray(v)
            row[k] = bool(a) if a.dtype == np.bool_ else float(a)
        if extra:
            row.update(extra)
        self.history.append(row)
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()
        return row

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def summarize(history) -> Dict:
    """Aggregate a metrics history: last values + extrema of the run."""
    if not history:
        return {}
    out = {"steps": len(history), "last": history[-1]}
    keys = [k for k in history[-1] if k not in ("step", "time")]
    for k in keys:
        vals = [row[k] for row in history if k in row
                and isinstance(row[k], float)]
        if vals:
            out[f"max_{k}"] = max(vals)
    return out
