"""Fully implicit integrators: backward Euler, Crank-Nicolson, BDF2.

Capability parity with the reference's integrators/backward_euler.py,
crank_nicolson.py, bdf2.py — each step solves a nonlinear system with the
Jacobian-free Newton-Krylov solver (exact jvp Jacobian + FGMRES).
"""

from time import time
from typing import Callable

import jax.numpy as jnp

from ..solvers.nonlin import newton_krylov
from .base import Integrator, SolverInfo


class BackwardEuler(Integrator):
    def __init__(self, rhs: Callable, tolerance: float = 1e-7, **kwargs) -> None:
        super().__init__(**kwargs)
        self.rhs = rhs
        self.tol = tolerance

    def __step__(self, q, dt: float):
        rhs = self.rhs

        def residual(q_plus):
            return (q_plus - q) / dt - rhs(q_plus)

        t0 = time()
        new_q, num_iter, residuals = newton_krylov(residual, q, f_tol=self.tol,
                                                   fgmres_precond=self.preconditioner)
        self.solver_info = SolverInfo(total_num_it=num_iter, residuals=residuals)
        self.latest_time = time() - t0
        return jnp.asarray(new_q).reshape(q.shape)


class CrankNicolson(Integrator):
    def __init__(self, rhs: Callable, tolerance: float = 1e-7, **kwargs) -> None:
        super().__init__(**kwargs)
        self.rhs = rhs
        self.tol = tolerance

    def __step__(self, q, dt: float):
        rhs = self.rhs
        rhs_q = rhs(q)

        def residual(q_plus):
            return (q_plus - q) / dt - 0.5 * (rhs(q_plus) + rhs_q)

        t0 = time()
        new_q, num_iter, residuals = newton_krylov(residual, q, f_tol=self.tol, fgmres_restart=30,
                                                   fgmres_precond=self.preconditioner)
        self.solver_info = SolverInfo(total_num_it=num_iter, residuals=residuals)
        self.latest_time = time() - t0
        return jnp.asarray(new_q).reshape(q.shape)


class Bdf2(Integrator):
    """2nd-order backward differentiation formula, bootstrapped with
    trapezoidal backward-Euler substeps like the reference bdf2.py."""

    def __init__(self, rhs: Callable, tolerance: float = 1e-7, init_substeps: int = 1, **kwargs) -> None:
        super().__init__(**kwargs)
        self.rhs = rhs
        self.tol = tolerance
        self.init_substeps = init_substeps
        self.q_prev = None

    def __step__(self, q, dt: float):
        rhs = self.rhs
        if self.q_prev is None:
            new_q = q
            for _ in range(self.init_substeps):
                init_dt = dt / self.init_substeps
                q_base = new_q

                def residual(q_plus):
                    return (q_plus - q_base) / init_dt - 0.5 * rhs(q_plus)

                new_q, num_iter, residuals = newton_krylov(residual, q_base, f_tol=self.tol)
        else:
            q_prev = self.q_prev

            def residual(q_plus):
                return (q_plus - 4.0 / 3.0 * q + 1.0 / 3.0 * q_prev) / dt - 2.0 / 3.0 * rhs(q_plus)

            new_q, num_iter, residuals = newton_krylov(residual, q, f_tol=self.tol,
                                                       fgmres_precond=self.preconditioner)
        self.solver_info = SolverInfo(total_num_it=num_iter, residuals=residuals)
        self.q_prev = q
        return jnp.asarray(new_q).reshape(q.shape)
