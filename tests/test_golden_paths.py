"""Self-golden regression for the no-oracle paths (VERDICT r2 missing #4).

MacCormack, RK2, vorticity confinement, multigrid and the 3D smoke plume
have no C++ arbiter; these tests pin their trajectories to committed
goldens generated on this same CPU backend (``tools/gen_golden_paths.py``).
A numerics change in any of them fails here until the golden is
deliberately regenerated."""

import os

import numpy as np
import pytest

from esp32_fluid_simulation_tpu import SimConfig, init_state, make_step
from tools.gen_golden_paths import CONFIGS, STEPS, schedule

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_path_matches_golden(name):
    path = os.path.join(GOLDEN_DIR, f"path_{name}.npz")
    cfg = CONFIGS[name]
    st = init_state(cfg)
    fn = make_step(cfg, donate=False)
    for t in range(STEPS):
        st = fn(st, schedule(cfg, t))
    with np.load(path) as z:
        np.testing.assert_allclose(np.asarray(st.velocity), z["velocity"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(st.color, np.float32),
                                   z["color"], rtol=1e-4, atol=1e-4)


def test_smoke3d_matches_golden():
    from esp32_fluid_simulation_tpu.models.smoke3d import (SmokeConfig,
                                                           init_smoke,
                                                           make_smoke_step)
    cfg = SmokeConfig(shape=(24, 24, 24), solver="multigrid", sor_iters=4)
    st = init_smoke(cfg)
    fn = make_smoke_step(cfg, donate=False)
    for _ in range(STEPS):
        st = fn(st)
    # scalars are stored bfloat16 by default (r4 b70f331); golden holds
    # their exact float32 casts, regenerated under those defaults
    with np.load(os.path.join(GOLDEN_DIR, "path_smoke3d.npz")) as z:
        np.testing.assert_allclose(np.asarray(st.velocity), z["velocity"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(st.density, np.float32),
                                   z["density"], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(st.temperature, np.float32),
                                   z["temperature"], rtol=1e-4, atol=1e-4)
