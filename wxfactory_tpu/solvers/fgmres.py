"""FGMRES with one-synchronization-per-iteration Gram-Schmidt.

Flexible GMRES (right-preconditioned, restarted) whose orthogonalization is
the low-synchronization inverse-compact-WY scheme with lagged normalization
(Swirydowicz, Langou, Ananthan, Yang & Thomas 2020) — one batched global
reduction per Krylov iteration. Capability parity with the reference's
solvers/fgmres.py:16-97; under GSPMD the single batched Gram product is the
only collective of the iteration.

Host-orchestrated: the per-iteration small algebra (Givens rotations,
triangular solves) is numpy; the operator A (an RHS jvp) runs jitted on
device.
"""

import math
from time import time
from typing import Callable, List, Optional, Tuple

import numpy as np
import scipy.linalg


def _givens(a: float, b: float) -> Tuple[float, float, float]:
    """Coefficients (c, s, r) of the Givens rotation zeroing b against a."""
    if b == 0.0:
        return 1.0, 0.0, a
    if a == 0.0:
        return 0.0, 1.0, b
    scl = min(abs(a), abs(b))
    sigma = math.copysign(1.0, a) if abs(a) > abs(b) else math.copysign(1.0, b)
    r = sigma * scl * math.sqrt((a / scl) ** 2 + (b / scl) ** 2)
    return a / r, b / r, r


def _low_sync_orthonormalize(V, R, T, K, j: int) -> float:
    """One step of 1-sync lagged-normalization iterated Gram-Schmidt.

    Row j-1 of V (0-based: V[j-1]) is orthogonalized against the previous
    rows and row j-2 is normalized (its normalization was lagged one
    iteration). All global information needed comes from ONE batched product
    of V[:j] with the last two rows.

    Returns the (lagged) norm used to rescale, or -1 on the first call.
    """
    if j < 2:
        return -1.0

    # The single global reduction of the iteration:
    gram = V[:j, :] @ V[j - 2 : j, :].T  # (j, 2)
    prev = gram[: j - 2, 0]  # <V_i, V_{j-2}> for i < j-2

    R[: j - 1, j - 1] = gram[: j - 1, 1]
    norm2 = gram[j - 2, 0] - prev @ prev
    norm = math.sqrt(norm2)
    R[j - 2, j - 2] = norm
    R[j - 2, j - 1] = (R[j - 2, j - 1] - prev @ R[: j - 2, j - 1]) / norm
    T[: j - 2, j - 2] = prev / norm

    if j > 2:
        low = np.tril(T[: j - 2, : j - 2].T, -1) + np.eye(j - 2)
        corr = np.linalg.solve(low, prev)
        R[: j - 2, j - 2] = K[: j - 2, j - 3] + corr
        K[: j - 1, j - 2] = (R[: j - 1, j - 1] - R[: j - 1, 1 : j - 1] @ corr) / norm
        V[j - 2, :] -= V[: j - 2, :].T @ prev
        V[j - 1, :] -= V[: j - 2, :].T @ R[: j - 2, j - 1]
    else:
        K[: j - 1, j - 2] = R[: j - 1, j - 1] / norm

    V[j - 2, :] /= norm
    V[j - 1, :] -= V[j - 2, :] * R[j - 2, j - 1]
    V[j - 1, :] /= norm
    return norm


def fgmres(
    A: Callable,
    b: np.ndarray,
    x0: Optional[np.ndarray] = None,
    tol: float = 1e-5,
    restart: int = 20,
    maxiter: Optional[int] = None,
    preconditioner: Optional[Callable] = None,
    hegedus: bool = False,
    verbose: int = 0,
) -> Tuple[np.ndarray, float, float, int, int, List[Tuple[float, float, float]]]:
    """Solve Ax = b. Returns (x, |r|, |b|, num_iter, flag, residual_history).

    flag: 0 converged, -1 not converged / stagnated.
    """
    b = np.asarray(b, dtype=np.float64).ravel()
    n = b.size
    t_start = time()
    niter = 0

    precond = preconditioner if preconditioner is not None else (lambda v: v)
    if maxiter is None:
        maxiter = n * 10

    x = np.zeros_like(b) if x0 is None else np.array(x0, dtype=np.float64).ravel()

    norm_b = float(np.linalg.norm(b))
    if norm_b == 0.0:
        return np.zeros_like(b), 0.0, 0.0, 0, 0, [(0.0, time() - t_start, 0.0)]
    tol_rel = tol * norm_b

    ax = np.asarray(A(x)).ravel()
    residuals: List[Tuple[float, float, float]] = []

    if hegedus:
        norm_ax2 = float(ax @ ax)
        if norm_ax2 != 0.0:
            x = (float(b @ ax) / norm_ax2) * x
            ax = np.asarray(A(x)).ravel()

    r = b - ax
    norm_r = float(np.linalg.norm(r))
    residuals.append((norm_r / norm_b, time() - t_start, 0.0))

    flag = -1
    for _ in range(maxiter):
        H = np.zeros((restart + 2, restart + 2))
        R = np.zeros((restart + 2, restart + 2))
        T = np.zeros((restart + 2, restart + 2))
        K = np.zeros((restart + 2, restart + 2))
        V = np.zeros((restart + 2, n))
        Z = np.zeros((restart + 1, n))
        givens: List[np.ndarray] = []

        V[0, :] = r / norm_r
        Z[0, :] = precond(V[0, :])
        V[1, :] = np.asarray(A(Z[0, :])).ravel()
        v_norm = _low_sync_orthonormalize(V, R, T, K, 2)

        g = np.zeros(restart + 2)
        g[0] = norm_r

        inner = -1
        for inner in range(restart):
            niter += 1
            Z[inner + 1, :] = precond(V[inner + 1])
            V[inner + 2, :] = np.asarray(A(Z[inner + 1, :] / v_norm)).ravel() * v_norm
            v_norm = _low_sync_orthonormalize(V, R, T, K, inner + 3)
            H[inner, : inner + 2] = R[: inner + 2, inner + 1]
            Z[inner + 1, :] /= v_norm

            # Apply the accumulated Givens rotations to the new column of H
            for jj, qb in enumerate(givens):
                H[inner, jj : jj + 2] = qb @ H[inner, jj : jj + 2]

            if H[inner, inner + 1] != 0.0:
                c, s, _ = _givens(H[inner, inner], H[inner, inner + 1])
                qb = np.array([[c, s], [-s, c]])
                givens.append(qb)
                g[inner : inner + 2] = qb @ g[inner : inner + 2]
                H[inner, inner] = qb[0, :] @ H[inner, inner : inner + 2]
                H[inner, inner + 1] = 0.0

            if inner < restart - 1:
                norm_r = abs(g[inner + 1])
                residuals.append((norm_r / norm_b, time() - t_start, 0.0))
                if verbose > 1:
                    print(f"fgmres: |r|/|b| = {residuals[-1][0]:.3e}", flush=True)
                if norm_r < tol_rel:
                    break

        # Solve the small triangular system and update the iterate.
        y = scipy.linalg.solve_triangular(H[: inner + 1, : inner + 1].T, g[: inner + 1])
        update = Z[: inner + 1, :].T @ y
        x = x + update
        r = b - np.asarray(A(x)).ravel()
        norm_r = float(np.linalg.norm(r))
        residuals.append((norm_r / norm_b, time() - t_start, 0.0))
        if verbose > 0:
            print(f"fgmres: restart residual {norm_r / norm_b:.2e} (iter {niter})", flush=True)

        # Stagnation check
        nz = x != 0
        if nz.any() and float(np.max(np.abs(update[nz] / x[nz]))) < 1e-12:
            return x, norm_r, norm_b, niter, -1, residuals

        if norm_r < tol_rel:
            flag = 0
            break

    if norm_r < tol_rel:
        flag = 0
    return x, norm_r, norm_b, niter, flag, residuals
