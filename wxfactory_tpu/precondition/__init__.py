from .factorization import Factorization
from .multigrid import Multigrid, MultigridLevel

__all__ = ["Factorization", "Multigrid", "MultigridLevel"]
