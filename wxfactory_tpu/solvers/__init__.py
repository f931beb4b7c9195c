from .global_ops import global_dotprod, global_inf_norm, global_norm
from .matvec import make_jvp_matvec, make_fd_matvec, make_rat_matvec
from .kiops import kiops
from .pmex import pmex
from .fgmres import fgmres
from .nonlin import newton_krylov
from .stats import PhiStats

__all__ = [
    "global_dotprod",
    "global_inf_norm",
    "global_norm",
    "make_jvp_matvec",
    "make_fd_matvec",
    "make_rat_matvec",
    "kiops",
    "pmex",
    "fgmres",
    "newton_krylov",
    "PhiStats",
]
