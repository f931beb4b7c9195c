"""Direct-factorization preconditioner (LU / ILU).

Capability parity with the reference's precondition/factorization.py
(Factorization): assemble the full (I - dt/2 J) system matrix by probing
the matrix-free operator, factorize with scipy splu/spilu, and apply the
factorization as the preconditioner inside FGMRES. Practical only for
small problems — exactly like the reference.
"""

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse
import scipy.sparse.linalg

from ..solvers.eigenvalue_util import jacobian_matrix


class Factorization:
    def __init__(self, rhs: Callable, kind: str = "lu", drop_tol: float = 1e-4, fill_factor: float = 10.0):
        if kind not in ("lu", "ilu"):
            raise ValueError(f"Factorization kind must be 'lu' or 'ilu', got {kind}")
        self.rhs = rhs
        self.kind = kind
        self.drop_tol = drop_tol
        self.fill_factor = fill_factor
        self._solve = None

    def prepare(self, dt: float, q) -> None:
        """(Re)build and factorize I - dt/2 J at the current state."""
        jac = jacobian_matrix(self.rhs, q)
        n = jac.shape[0]
        system = np.eye(n) - 0.5 * dt * jac
        sp = scipy.sparse.csc_matrix(system)
        if self.kind == "lu":
            fact = scipy.sparse.linalg.splu(sp)
        else:
            fact = scipy.sparse.linalg.spilu(sp, drop_tol=self.drop_tol, fill_factor=self.fill_factor)
        self._solve = fact.solve

    def __call__(self, v):
        if self._solve is None:
            raise RuntimeError("Factorization.prepare(dt, q) must be called before applying")
        return self._solve(np.asarray(v).ravel())
