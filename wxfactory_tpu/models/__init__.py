from .euler_cartesian import make_rhs_euler_cartesian

__all__ = ["make_rhs_euler_cartesian"]
