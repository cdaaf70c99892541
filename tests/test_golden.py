"""Golden-trajectory regression: the committed oracle dump pins the
reference semantics; both the framework and the live oracle must match it
(tools/gen_golden.py regenerates; SURVEY.md §4.2)."""

import os

import numpy as np
import jax.numpy as jnp

from esp32_fluid_simulation_tpu import SimConfig, Impulses, init_state, make_step
import oracle

F = np.float32
GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "ref_61x81_4steps.npz")


def _schedule(t):
    return [
        ((10 + t, 20), (120.0, -60.0)),
        ((30, 40 + t), (-90.0, 150.0)),
        ((45, 60), (50.0, 50.0)),
    ]


def test_framework_matches_golden():
    with np.load(GOLDEN) as z:
        want_v, want_c = z["velocity"], z["color"]
    cfg = SimConfig()
    st = init_state(cfg)
    fn = make_step(cfg, donate=False)
    for t in range(4):
        imps = _schedule(t)
        st = fn(st, Impulses.from_lists(cfg, [p for p, _ in imps],
                                        [v for _, v in imps]))
    np.testing.assert_allclose(np.asarray(st.velocity),
                               np.moveaxis(want_v, -1, 0),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st.color),
                               np.clip(np.moveaxis(want_c, -1, 0), 0, 1),
                               rtol=1e-4, atol=2e-4)


def test_live_oracle_matches_golden():
    """Guards the oracle itself against drift."""
    with np.load(GOLDEN) as z:
        want_v = z["velocity"]
    vel = np.zeros((61, 81, 2), F)
    col = oracle.init_color(61, 81)
    for t in range(4):
        vel, col, _, _ = oracle.step(vel, col, _schedule(t))
    np.testing.assert_array_equal(vel, want_v)
