"""GCROT(m,k): recycled-subspace Krylov linear solver.

Capability parity with the reference's solvers/gcrot.py (a vendored scipy
derivative). Here we delegate to scipy.sparse.linalg.gcrotmk — same
algorithm, maintained upstream — adapted to the framework's matrix-free
callable + residual-history interface (matching fgmres's return contract).
"""

from time import time
from typing import Callable, List, Optional, Tuple

import numpy as np
import scipy.sparse.linalg


def gcrot(
    A: Callable,
    b: np.ndarray,
    x0: Optional[np.ndarray] = None,
    tol: float = 1e-5,
    restart: int = 20,
    maxiter: Optional[int] = None,
    preconditioner: Optional[Callable] = None,
    verbose: int = 0,
) -> Tuple[np.ndarray, float, float, int, int, List]:
    """Solve Ax = b. Returns (x, |r|, |b|, num_iter, flag, residuals)."""
    b = np.asarray(b, dtype=np.float64).ravel()
    n = b.size
    op = scipy.sparse.linalg.LinearOperator((n, n), matvec=lambda v: np.asarray(A(v)).ravel())
    M = None
    if preconditioner is not None:
        M = scipy.sparse.linalg.LinearOperator((n, n), matvec=lambda v: np.asarray(preconditioner(v)).ravel())

    residuals: List = []
    count = [0]
    norm_b0 = float(np.linalg.norm(b)) or 1.0
    t0 = time()

    def callback(xk):
        # Fill the same (rel_residual, time, work) history fgmres returns.
        # gcrotmk gives only the iterate, so the residual costs one extra
        # matvec per outer iteration — acceptable for this non-hot solver.
        count[0] += 1
        rn = float(np.linalg.norm(b - op.matvec(xk)))
        residuals.append((rn / norm_b0, time() - t0, 0.0))

    x, info = scipy.sparse.linalg.gcrotmk(
        op, b, x0=x0, rtol=tol, atol=0.0, m=restart, k=restart,
        maxiter=maxiter or 200, M=M, callback=callback,
    )
    norm_b = float(np.linalg.norm(b))
    norm_r = float(np.linalg.norm(b - op.matvec(x)))
    flag = 0 if info == 0 else -1
    return x, norm_r, norm_b, count[0], flag, residuals
