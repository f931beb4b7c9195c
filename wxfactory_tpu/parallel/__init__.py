from .distributed import (
    gather_global,
    init_distributed,
    is_primary,
    load_state_distributed,
    primary_print,
    save_state_distributed,
)
from .topology import EAST, NORTH, SOUTH, WEST, CubedSphereTopology

__all__ = [
    "CubedSphereTopology", "SOUTH", "NORTH", "WEST", "EAST",
    "init_distributed", "is_primary", "primary_print", "gather_global",
    "save_state_distributed", "load_state_distributed",
]
