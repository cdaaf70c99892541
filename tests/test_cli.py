"""CLI runner tests: config round-trip, checkpoints/resume, metrics, dumps,
watchdog — the reference author's dev-harness workflow (SURVEY.md §4)."""

import json
import os

import numpy as np

from esp32_fluid_simulation_tpu.run import main as run_main
from esp32_fluid_simulation_tpu.utils.checkpoint import (load_checkpoint,
                                                         load_arr)


def test_cli_basic_run_and_frame(tmp_path, capsys):
    frame = str(tmp_path / "last.ppm")
    run_main(["--grid", "17", "25", "--steps", "5", "--frame", frame])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["final_step"] == 5
    assert os.path.getsize(frame) > 100


def test_cli_config_save_and_load(tmp_path, capsys):
    cfg_path = str(tmp_path / "sim_params.json")
    run_main(["--grid", "17", "25", "--solver", "jacobi", "--steps", "2",
              "--save-config", cfg_path])
    capsys.readouterr()
    run_main(["--config", cfg_path, "--steps", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["final_step"] == 2
    with open(cfg_path) as f:
        saved = json.load(f)
    assert saved["solver"] == "jacobi" and saved["shape"] == [17, 25]


def test_cli_checkpoint_resume(tmp_path, capsys):
    ck = str(tmp_path / "ckpt.npz")
    run_main(["--grid", "17", "25", "--steps", "6",
              "--checkpoint", ck, "--checkpoint-every", "3"])
    capsys.readouterr()
    state, cfg = load_checkpoint(ck)
    assert int(state.step) == 6
    run_main(["--resume", ck, "--steps", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["final_step"] == 10


def test_cli_metrics_and_dumps(tmp_path, capsys):
    mpath = str(tmp_path / "metrics.jsonl")
    dump = str(tmp_path / "fields")
    run_main(["--grid", "17", "25", "--steps", "6", "--metrics", mpath,
              "--metrics-every", "2", "--dump-fields", dump,
              "--dump-every", "3"])
    capsys.readouterr()
    rows = [json.loads(l) for l in open(mpath)]
    assert len(rows) == 3
    assert {"div_pre_max", "div_post_max", "poisson_residual_l2",
            "max_speed", "finite"} <= set(rows[0])
    assert all(r["finite"] for r in rows)
    v = load_arr(os.path.join(dump, "sim_velocity_000006.arr"))
    assert v.shape == (2, 17, 25) and np.isfinite(v).all()


def test_cli_watchdog(tmp_path, capsys):
    run_main(["--grid", "17", "25", "--steps", "4", "--watchdog"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["watchdog_resets"] == 0


def test_roofline_estimates():
    from esp32_fluid_simulation_tpu.utils.roofline import (speed_of_light,
                                                           TPU_SPECS)
    from esp32_fluid_simulation_tpu import SimConfig
    cfg = SimConfig(shape=(4096, 4096), scaling=1)
    fused = speed_of_light(cfg, "v5e", fused=True)
    composed = speed_of_light(cfg, "v5e", fused=False)
    assert fused["ideal_fps"] > composed["ideal_fps"] > 60
    assert fused["bytes_per_step"] < composed["bytes_per_step"]
    v5p = speed_of_light(cfg, "v5p", fused=True)
    assert v5p["ideal_fps"] > fused["ideal_fps"]


def test_cli_conflicting_flags_rejected(tmp_path):
    import pytest
    ck = str(tmp_path / "c.npz")
    run_main(["--grid", "17", "25", "--steps", "2", "--checkpoint", ck,
              "--checkpoint-every", "2"])
    with pytest.raises(SystemExit):
        run_main(["--resume", ck, "--grid", "33", "41", "--steps", "1"])
    with pytest.raises(SystemExit):
        run_main(["--grid", "17", "25", "--steps", "1", "--watchdog",
                  "--metrics", str(tmp_path / "m.jsonl")])


def test_cli_ensemble(tmp_path, capsys):
    """BASELINE config 4 through the CLI: a vmapped ensemble run."""
    frame = str(tmp_path / "member0.ppm")
    run_main(["--grid", "17", "25", "--steps", "3", "--ensemble", "4",
              "--frame", frame])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["final_step"] == 3 and out["ensemble"] == 4
    assert os.path.getsize(frame) > 100


def test_cli_ensemble_rejects_incompatible_flags(tmp_path):
    import pytest
    with pytest.raises(SystemExit):
        run_main(["--grid", "17", "25", "--steps", "1", "--ensemble", "4",
                  "--watchdog"])
