"""Checkpoint / resume and raw field dumps.

The reference has no in-tree checkpointing, but its ``.gitignore`` proves the
author's off-device harness dumped per-field arrays (``sim_color.arr``,
``sim_divergence.arr``, ``sim_pressure.arr``, ``sim_velocity.arr``) plus a
``sim_params.json`` (``.gitignore:4-8``).  State is exactly two arrays plus a
step counter (``.ino:54-55``); pressure/divergence are recomputed per frame.

This module makes that workflow first-class: npz checkpoints of the state
pytree (+ config JSON for reproducibility) and ``.arr``-style raw dumps for
cross-validation against the oracle.  Orbax is used when available for
large/sharded states; plain npz otherwise.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np
import jax

from ..config import SimConfig
from ..state import SimState


def save_checkpoint_orbax(path: str, state, cfg: SimConfig) -> None:
    """Orbax checkpoint (for large / sharded states: saves per-shard without
    gathering to host).  Plain npz (`save_checkpoint`) is the default for
    single-chip states."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state._asdict(), force=True)
    ckptr.wait_until_finished()
    with open(os.path.abspath(path) + os.sep + "sim_params.json", "w") as f:
        f.write(cfg.to_json())


def load_checkpoint_orbax(path: str, template) -> tuple:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), template._asdict())
    with open(os.path.abspath(path) + os.sep + "sim_params.json") as f:
        cfg = SimConfig.from_json(f.read())
    return type(template)(**restored), cfg


def save_checkpoint(path: str, state: SimState, cfg: SimConfig) -> None:
    """Atomic npz checkpoint of {velocity, color, step} + config JSON."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            velocity=np.asarray(jax.device_get(state.velocity)),
            color=np.asarray(jax.device_get(state.color)),
            step=np.asarray(jax.device_get(state.step)),
            config=np.frombuffer(cfg.to_json().encode(), dtype=np.uint8),
        )
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[SimState, SimConfig]:
    with np.load(path) as z:
        cfg = SimConfig.from_json(bytes(z["config"]).decode())
        import jax.numpy as jnp
        state = SimState(
            velocity=jnp.asarray(z["velocity"]),
            color=jnp.asarray(z["color"]),
            step=jnp.asarray(z["step"]),
        )
    return state, cfg


def dump_arr(path: str, arr) -> None:
    """Raw little-endian dump with a JSON sidecar (shape/dtype) — the
    ``sim_*.arr`` + ``sim_params.json`` workflow (``.gitignore:4-8``)."""
    a = np.asarray(jax.device_get(arr))
    a.astype(a.dtype.newbyteorder("<")).tofile(path)
    with open(path + ".json", "w") as f:
        json.dump({"shape": list(a.shape), "dtype": str(a.dtype)}, f)


def load_arr(path: str) -> np.ndarray:
    with open(path + ".json") as f:
        meta = json.load(f)
    a = np.fromfile(path, dtype=np.dtype(meta["dtype"]).newbyteorder("<"))
    return a.reshape(meta["shape"])
