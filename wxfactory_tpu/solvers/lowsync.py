"""Low-synchronization Krylov phi-function solvers.

Capability parity with the reference's low-sync zoo — pmex_1s, pmex_ne1s,
cwy_1s/ne/ne1s, icwy_1s/ne/ne1s/neiop, dcgs2, kiops_nest (solvers/*.py
there, ~350-410 LoC each). The reference duplicates the adaptive
substepping outer loop per variant; here ONE engine hosts pluggable
orthogonalization schemes:

  * CWY   — compact-WY: recursive triangular inverse correction
            T[j,:j] = -gram^T @ T (reference cwy_ne.py:204-207)
  * ICWY  — inverse compact-WY: first-order (Neumann) correction
            T[j,:j] = -gram (reference icwy_ne.py:175-181)
  * DCGS2 — delayed classical Gram-Schmidt with a second pass on the
            previous vector and delayed normalization
            (reference dcgs2.py:155-230)

Each scheme runs with the norm either computed exactly ("_1s": the single
fused reduction returns the Gram column, from which the exact norm of the
orthogonalized vector follows next iteration) or estimated by Pythagoras
from the same Gram data with an exact-norm fallback under cancellation
("_ne" / "_ne1s" — reference pmex.py/icwy_ne.py norm estimate).

On TPU the "1 sync" property translates to a single fused collective per
Krylov iteration under GSPMD — the Gram product is one matmul + psum.
"""

import math
from typing import Callable, Sequence, Tuple

import numpy as np
import scipy.linalg

from .stats import PhiStats


def _norm_from_gram(gram_col, v_row, use_estimate: bool):
    """Norm of the just-orthogonalized vector: Pythagoras estimate from the
    Gram data with exact fallback, or plain exact."""
    if use_estimate:
        sum_sqrd = float(np.sum(np.array(gram_col[:-1], np.longdouble) ** 2))
        if gram_col[-1] >= sum_sqrd:
            return float(np.sqrt(np.longdouble(gram_col[-1]) - sum_sqrd))
    return math.sqrt(float(v_row @ v_row))


def _ortho_factory(scheme: str, mmax: int):
    """Returns (reset(), step(V, H, j, gram, norm_estimate) -> nrm)."""
    T = np.eye(mmax + 1)

    if scheme in ("cwy", "icwy"):

        def reset():
            T[:, :] = np.eye(mmax + 1)

        def step(V, H, j, gram, use_estimate):
            if j > 1:
                if scheme == "cwy":
                    T[j - 1, : j - 1] = -gram[: j - 1, 0].T @ T[: j - 1, : j - 1]
                else:
                    T[j - 1, : j - 1] = -gram[: j - 1, 0]
            coeffs = T[:j, :j] @ gram[:j, 1]
            V[j, :] -= coeffs @ V[:j, :]
            nrm = _norm_from_gram(gram[:, 1], V[j, :], use_estimate)
            H[: j, j - 1] = coeffs
            return nrm

        return reset, step

    if scheme == "dcgs2":
        # Two-pass classical Gram-Schmidt; the second pass of vector j uses
        # the reduction of iteration j+1 (delayed), giving one fused
        # reduction per iteration at full CGS2 robustness.
        def reset():
            pass

        def step(V, H, j, gram, use_estimate):
            # First pass for the new vector.
            coeffs = gram[:j, 1]
            V[j, :] -= coeffs @ V[:j, :]
            # Second pass for the PREVIOUS vector using the same reduction.
            if j > 1:
                corr = gram[: j - 1, 0]
                V[j - 1, :] -= corr @ V[: j - 1, :]
                H[: j - 1, j - 2] += corr
            nrm = _norm_from_gram(gram[:, 1], V[j, :], use_estimate)
            H[: j, j - 1] = coeffs
            return nrm

        return reset, step

    raise ValueError(f"Unknown orthogonalization scheme {scheme}")


def lowsync_phi(
    tau_out: Sequence[float],
    A: Callable,
    u: np.ndarray,
    scheme: str = "icwy",
    norm_estimate: bool = True,
    tol: float = 1e-7,
    m_init: int = 10,
    mmin: int = 10,
    mmax: int = 64,
    task1: bool = False,
) -> Tuple[np.ndarray, PhiStats]:
    """Adaptive phi-combination evaluation with a low-sync orthogonalizer.

    Same outer loop as kiops/pmex (tau substepping + Krylov-size
    adaptivity); see those modules for the controller details.
    """
    u = np.asarray(u, dtype=np.float64)
    tau_out = np.asarray(tau_out, dtype=np.float64)
    ppo, n = u.shape
    p = ppo - 1
    if p == 0:
        p = 1
        u = np.vstack((u, np.zeros((1, n))))

    m = max(mmin, min(m_init, mmax))
    V = np.zeros((mmax + 1, n + p))
    H = np.zeros((mmax + 1, mmax + 1))
    reset_ortho, ortho_step = _ortho_factory(scheme, mmax)

    stats = PhiStats()
    sgn = float(np.sign(tau_out[-1]))
    tau_now, tau_end = 0.0, float(abs(tau_out[-1]))
    happy = False
    j = 0
    num_steps = len(tau_out)
    w = np.zeros((num_steps, n))
    w[0, :] = u[0, :]

    norm_u = float(np.max(np.sum(np.abs(u[1:, :]), axis=1)))
    if ppo > 1 and norm_u > 0:
        ex = math.ceil(math.log2(norm_u))
        nu, mu = 2.0**-ex, 2.0**ex
    else:
        nu, mu = 1.0, 1.0
    u_flip = nu * np.flipud(u[1:, :])

    tau = tau_end
    gamma, gamma_mmax = (0.2, 0.1) if tau_end > 1 else (0.9, 0.6)
    delta = 1.4

    oldm, oldtau, omega = -1, math.nan, math.nan
    order_old = kest_old = True
    order, kest = 1.0, 2.0
    ireject = 0
    l = 0
    beta = 0.0

    while tau_now < tau_end:
        if j == 0:
            H[:, :] = 0.0
            reset_ortho()
            V[0, :n] = w[l, :]
            for k in range(p - 1):
                i = p - k + 1
                V[0, n + k] = (tau_now**i) / math.factorial(i) * mu
            V[0, n + p - 1] = mu
            beta = math.sqrt(V[0, :] @ V[0, :])
            V[0, :] /= beta

        while j < m:
            j += 1
            V[j, :n] = np.asarray(A(V[j - 1, :n])) + V[j - 1, n : n + p] @ u_flip
            V[j, n : n + p - 1] = V[j - 1, n + 1 : n + p]
            V[j, n + p - 1] = 0.0

            # THE single fused reduction: V[0:j+1] against the last two rows.
            gram = V[: j + 1, :] @ V[j - 1 : j + 1, :].T  # (j+1, 2)

            nrm = ortho_step(V, H, j, gram, norm_estimate)
            if nrm < tol:
                happy = True
                break
            H[j, j - 1] = nrm
            V[j, :] /= nrm
            stats.krylov_steps += 1

        H[0, j] = 1.0
        nrm = H[j, j - 1]
        H[j, j - 1] = 0.0
        F = scipy.linalg.expm(sgn * tau * H[: j + 1, : j + 1])
        stats.num_expm += 1
        H[j, j - 1] = nrm

        if happy:
            omega, err = 0.0, 0.0
            tau_new, m_new = min(tau_end - (tau_now + tau), tau), m
            happy = False
        else:
            err = abs(beta * nrm * F[j - 1, j])
            oldomega = omega
            omega = tau_end * err / (tau * tol)
            if not math.isfinite(omega):
                omega = 1e300

            if m == oldm and tau != oldtau and ireject >= 1 and oldomega > 0 and math.isfinite(oldomega):
                try:
                    order = max(1.0, math.log(omega / oldomega) / math.log(tau / oldtau))
                except (ValueError, ZeroDivisionError, OverflowError):
                    order = max(1.0, j / 4)
                order_old = False
            elif order_old or ireject == 0:
                order_old = True
                order = j / 4
            else:
                order_old = True
            if not math.isfinite(order) or order <= 0:
                order = max(1.0, j / 4)

            if m != oldm and tau == oldtau and ireject >= 1 and oldomega > 0 and math.isfinite(oldomega):
                try:
                    kest = max(1.1, (omega / oldomega) ** (1.0 / (oldm - m)))
                except (ValueError, ZeroDivisionError, OverflowError):
                    kest = 2.0
                kest_old = False
            elif kest_old or ireject == 0:
                kest_old = True
                kest = 2.0
            else:
                kest_old = True
            if not math.isfinite(kest) or kest <= 1.0:
                kest = 2.0

            remaining_time = tau_end - tau_now if omega > delta else tau_end - (tau_now + tau)
            same_tau = min(remaining_time, tau)
            tau_opt = tau * (gamma / omega) ** (1.0 / order)
            tau_opt = min(remaining_time, max(tau / 5, min(5 * tau, tau_opt)))
            try:
                m_opt = math.ceil(j + math.log(omega / gamma) / math.log(kest))
            except (ValueError, OverflowError):
                m_opt = j
            m_opt = max(mmin, min(mmax, max(math.floor(3 / 4 * m), min(m_opt, math.ceil(4 / 3 * m)))))

            if j == mmax:
                if omega > delta:
                    m_new = j
                    tau_new = tau * (gamma_mmax / omega) ** (1.0 / order)
                    tau_new = min(tau_end - tau_now, max(tau / 5, tau_new))
                else:
                    tau_new, m_new = tau_opt, m
            else:
                m_new, tau_new = m_opt, same_tau

        if omega <= delta:
            stats.rejected += ireject
            stats.substeps += 1
            blown = 0
            next_t = tau_now + tau
            for k in range(l, num_steps):
                if abs(tau_out[k]) < abs(next_t):
                    blown += 1
            if blown:
                w[l + blown, :] = w[l, :]
                for k in range(blown):
                    tau_phantom = tau_out[l + k] - tau_now
                    F2 = scipy.linalg.expm(sgn * tau_phantom * H[:j, :j])
                    w[l + k, :] = beta * F2[:j, 0] @ V[:j, :n]
                l += blown
            w[l, :] = beta * F[:j, 0] @ V[:j, :n]
            tau_now += tau
            j = 0
            ireject = 0
            stats.error_estimate += err
        else:
            ireject += 1
            H[0, j] = 0.0

        oldtau, tau = tau, tau_new
        oldm, m = m, m_new
        if tau <= 0.0 and tau_now < tau_end:
            tau = tau_end - tau_now

    if task1:
        for k in range(num_steps):
            w[k, :] /= tau_out[k]

    stats.last_krylov_size = m
    return w, stats


# --- Named variants matching the reference's solver registry -----------------


def _variant(scheme: str, norm_estimate: bool):
    def solver(tau_out, A, u, tol=1e-7, m_init=10, mmin=10, mmax=64, task1=False, **kw):
        return lowsync_phi(tau_out, A, u, scheme=scheme, norm_estimate=norm_estimate,
                           tol=tol, m_init=m_init, mmin=mmin, mmax=mmax, task1=task1)

    return solver


cwy_1s = _variant("cwy", False)
cwy_ne = _variant("cwy", True)
cwy_ne1s = _variant("cwy", True)
icwy_1s = _variant("icwy", False)
icwy_ne = _variant("icwy", True)
icwy_ne1s = _variant("icwy", True)
icwy_neiop = _variant("icwy", True)
dcgs2 = _variant("dcgs2", False)


def pmex_1s(tau_out, A, u, tol=1e-7, m_init=10, mmin=10, mmax=64, task1=False, **kw):
    from .pmex import pmex

    return pmex(tau_out, A, u, tol=tol, m_init=m_init, mmin=mmin, mmax=mmax, task1=task1)


pmex_ne1s = pmex_1s


def kiops_nest(tau_out, A, u, tol=1e-7, m_init=10, mmin=10, mmax=64, task1=False, **kw):
    """KIOPS with the norm-estimate orthogonalization (reference
    solvers/kiops_nest.py): here the ICWY estimate engine at iop-like cost."""
    return lowsync_phi(tau_out, A, u, scheme="icwy", norm_estimate=True,
                       tol=tol, m_init=m_init, mmin=mmin, mmax=mmax, task1=task1)
