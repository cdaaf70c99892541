from .topology import make_mesh, grid_axes
from .halo import exchange_halo
from .sharded import (make_sharded_step, make_sharded_step_with_metrics,
                      sharded_state_sharding)
from .sharded_tiled import make_sharded_tiled_step, make_sharded_ensemble_step

__all__ = [
    "make_mesh",
    "grid_axes",
    "exchange_halo",
    "make_sharded_step",
    "make_sharded_step_with_metrics",
    "make_sharded_tiled_step",
    "make_sharded_ensemble_step",
    "sharded_state_sharding",
]
