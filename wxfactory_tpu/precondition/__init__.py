from .factorization import Factorization

__all__ = ["Factorization"]
