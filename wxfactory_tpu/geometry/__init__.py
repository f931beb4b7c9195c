from .cartesian import Cartesian2D, make_cartesian_2d
from .cubed_sphere import CubedSphere2D, make_cubed_sphere_2d
from .metric import Metric2D, make_metric_2d

__all__ = [
    "Cartesian2D",
    "make_cartesian_2d",
    "CubedSphere2D",
    "make_cubed_sphere_2d",
    "Metric2D",
    "make_metric_2d",
]
