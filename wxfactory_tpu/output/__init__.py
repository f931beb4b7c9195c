from .diagnostics import (
    absolute_vorticity,
    global_integral_2d,
    potential_enstrophy,
    potential_vorticity,
    relative_vorticity,
    total_energy,
)
from .manager import OutputManager
from .solver_stats import SolverStatsOutput
from .state import load_state, save_state

__all__ = [
    "OutputManager",
    "SolverStatsOutput",
    "save_state",
    "load_state",
    "relative_vorticity",
    "absolute_vorticity",
    "potential_vorticity",
    "potential_enstrophy",
    "total_energy",
    "global_integral_2d",
]
