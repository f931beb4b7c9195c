from .cartesian import Cartesian2D

__all__ = ["Cartesian2D"]
