from .cartesian import initialize_cartesian2d

__all__ = ["initialize_cartesian2d"]
