from .topology import make_mesh, grid_axes
from .halo import exchange_halo
from .sharded import make_sharded_step, sharded_state_sharding

__all__ = [
    "make_mesh",
    "grid_axes",
    "exchange_halo",
    "make_sharded_step",
    "sharded_state_sharding",
]
