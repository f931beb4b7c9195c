from .problems import (
    make_allen_cahn,
    make_adr,
    make_burgers,
    make_porous_medium,
    initial_condition,
)

__all__ = [
    "make_allen_cahn",
    "make_adr",
    "make_burgers",
    "make_porous_medium",
    "initial_condition",
]
