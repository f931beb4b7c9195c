from .euler_cartesian import make_rhs_euler_cartesian
from .euler_cartesian_fv import make_rhs_euler_cartesian_fv
from .euler_cubesphere import make_rhs_euler_cubesphere
from .shallow_water import Topography, make_rhs_shallow_water

__all__ = [
    "make_rhs_euler_cartesian",
    "make_rhs_euler_cartesian_fv",
    "make_rhs_euler_cubesphere",
    "make_rhs_shallow_water",
    "Topography",
]
