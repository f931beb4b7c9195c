"""GCROT(m,k): recycled-subspace Krylov linear solver (native implementation).

Capability parity with the reference's solvers/gcrot.py:129 (a scipy-derived
GCROT(m,k)). Self-contained host implementation — no scipy delegate:

* Outer loop: a GCRO step built on an m-step Arnoldi process orthogonalized
  against BOTH the recycled C basis and the Krylov basis (classical
  Gram-Schmidt with one reorthogonalization pass, the host-solver analogue
  of the CGS2 used by the device Krylov solvers).
* The new recycle pair comes matvec-free from the Arnoldi relation:
  with z_j = M(v_j) (flexible right preconditioning) the process gives
  A Z = C B + V_{m+1} H, so for the least-squares minimizer y,
  u = Z y - U (B y)  and  c = A u = V_{m+1} (H y) — no extra A application
  (the reference/scipy form pays the same algebra, gcrot.py:218-266 there).
* Truncation: the recycle space keeps the most recent k (c, u) pairs
  (the reference's default "oldest" policy).

Returns the framework solver contract (matching fgmres): a tuple
(x, |r|, |b|, num_iter, flag, residuals) with residuals a list of
(relative residual, elapsed seconds, work) entries.
"""

from time import time
from typing import Callable, List, Optional, Tuple

import numpy as np


def gcrot(
    A: Callable,
    b: np.ndarray,
    x0: Optional[np.ndarray] = None,
    tol: float = 1e-5,
    restart: int = 20,
    maxiter: Optional[int] = None,
    preconditioner: Optional[Callable] = None,
    verbose: int = 0,
    recycle: Optional[int] = None,
) -> Tuple[np.ndarray, float, float, int, int, List]:
    """Solve Ax = b with GCROT(m, k); m = ``restart``, k = ``recycle`` or m.

    ``A`` and ``preconditioner`` are matrix-free callables on flat vectors.
    ``maxiter`` bounds the number of OUTER iterations (one inner Arnoldi
    cycle of up to m matvecs each), like the scipy/reference solver.
    """
    b = np.asarray(b, dtype=np.float64).ravel()
    n = b.size
    m = max(int(restart), 1)
    k = m if recycle is None else max(int(recycle), 1)
    maxiter = maxiter or 200
    # A may hand back a (read-only) view of a device array — copy so the
    # in-place Gram-Schmidt updates below are legal.
    mv = lambda v: np.array(A(v), dtype=np.float64).ravel()
    psolve = (
        (lambda v: np.asarray(preconditioner(v), dtype=np.float64).ravel())
        if preconditioner is not None
        else (lambda v: v)
    )

    x = np.zeros(n) if x0 is None else np.asarray(x0, dtype=np.float64).ravel().copy()
    norm_b = float(np.linalg.norm(b))
    if norm_b == 0.0:
        return x * 0.0, 0.0, 0.0, 0, 0, []
    r = b - mv(x) if x0 is not None and np.any(x) else b.copy()

    CU: List[Tuple[np.ndarray, np.ndarray]] = []  # (c, u) with A u = c, c orthonormal
    residuals: List[Tuple[float, float, float]] = []
    t0 = time()
    num_iter = 0
    norm_r = float(np.linalg.norm(r))
    tol_abs = tol * norm_b

    for _outer in range(maxiter):
        if norm_r <= tol_abs:
            break
        # Project the current residual out of the recycle space: the GCRO
        # minimization works in the complement of span(C).
        for c, u in CU:
            yc = float(c @ r)
            if yc != 0.0:
                x += yc * u
                r -= yc * c
        norm_r = float(np.linalg.norm(r))
        if norm_r <= tol_abs or norm_r == 0.0:
            break

        # --- inner Arnoldi (m steps), orthogonal to C -----------------------
        V = np.empty((m + 1, n))
        Z = np.empty((m, n))
        H = np.zeros((m + 1, m))
        Bm = np.zeros((len(CU), m))
        V[0] = r / norm_r
        j_done = 0
        breakdown = False
        for j in range(m):
            Z[j] = psolve(V[j])
            w = mv(Z[j])
            num_iter += 1
            # CGS against [C | V_0..j] with one reorthogonalization pass.
            for _pass in range(2):
                for i, (c, _u) in enumerate(CU):
                    h = float(c @ w)
                    Bm[i, j] += h
                    w -= h * c
                for i in range(j + 1):
                    h = float(V[i] @ w)
                    H[i, j] += h
                    w -= h * V[i]
            hj = float(np.linalg.norm(w))
            H[j + 1, j] = hj
            j_done = j + 1
            if hj <= 1e-14 * norm_r:  # happy breakdown
                V[j + 1] = 0.0
                breakdown = True
                break
            V[j + 1] = w / hj

        mj = j_done
        Hj = H[: mj + 1, :mj]
        rhs = np.zeros(mj + 1)
        rhs[0] = norm_r
        y, *_ = np.linalg.lstsq(Hj, rhs, rcond=None)

        # --- new recycle pair, matvec-free ---------------------------------
        u_new = Z[:mj].T @ y
        if CU:
            u_new -= np.array([u for _c, u in CU]).T @ (Bm[:, :mj] @ y)
        c_new = V[: mj + 1].T @ (Hj @ y)  # = A u_new
        alpha = float(np.linalg.norm(c_new))
        if alpha == 0.0:
            break
        c_new /= alpha
        u_new /= alpha

        gamma = float(c_new @ r)
        x += gamma * u_new
        r -= gamma * c_new
        norm_r = float(np.linalg.norm(r))
        residuals.append((norm_r / norm_b, time() - t0, 0.0))
        if verbose:
            print(f"gcrot outer {_outer}: |r|/|b| = {norm_r / norm_b:.3e} ({num_iter} matvecs)")

        CU.append((c_new, u_new))
        if len(CU) > k:
            CU.pop(0)  # truncate oldest
        if breakdown:
            break

    flag = 0 if norm_r <= tol_abs else -1
    return x, norm_r, norm_b, num_iter, flag, residuals
