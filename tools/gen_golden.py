"""Generate the committed golden trajectory from the NumPy oracle.

The golden file freezes the reference semantics (via the oracle
transliteration) at the reference grid with a fixed impulse schedule —
protecting against silent drift in BOTH the framework and the oracle
(SURVEY.md §4.2's golden `.arr` dumps, as an npz).

Run from the repo root:  python tools/gen_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import oracle  # noqa: E402

F = np.float32
H, W = 61, 81
STEPS = 4


def schedule(t):
    return [
        ((10 + t, 20), (120.0, -60.0)),
        ((30, 40 + t), (-90.0, 150.0)),
        ((45, 60), (50.0, 50.0)),
    ]


def main():
    vel = np.zeros((H, W, 2), F)
    col = oracle.init_color(H, W)
    snaps = {}
    for t in range(STEPS):
        vel, col, div, p = oracle.step(vel, col, schedule(t))
    snaps["velocity"] = vel
    snaps["color"] = col
    snaps["divergence"] = div
    snaps["pressure"] = p
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "ref_61x81_4steps.npz")
    np.savez_compressed(out, **snaps)
    print("wrote", out, {k: v.shape for k, v in snaps.items()})


if __name__ == "__main__":
    main()
