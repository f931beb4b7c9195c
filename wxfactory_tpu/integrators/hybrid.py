"""Hybrid implicit-explicit and implicit-exponential integrators.

Capability parity with the reference's integrators/imex2.py, rosexp2.py,
partrosexp2.py and sdirk.py: 2nd-order IMEX midpoint, the Rosenbrock-
exponential hybrids (exponential propagation of the full/partitioned
nonlinearity + a rational implicit solve), and the L-stable 2-stage SDIRK.

Each takes the relevant RHS callables (full / implicit / explicit split) as
pure jittable functions; Jacobian actions are exact jitted jvps.
"""

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..solvers import fgmres, newton_krylov, pmex
from .base import Integrator, SolverInfo


def _jitted_jvp(fn):
    @jax.jit
    def jvp(q, v, scale):
        return scale * jax.jvp(fn, (q,), (v.reshape(q.shape),))[1].ravel()

    return jvp


class Imex2(Integrator):
    """2nd-order IMEX midpoint (reference imex2.py:10-27)."""

    def __init__(self, rhs_exp: Callable, rhs_imp: Callable, tolerance: float = 1e-7, **kwargs):
        super().__init__(**kwargs)
        self.rhs_exp = jax.jit(rhs_exp)
        self.rhs_imp = jax.jit(rhs_imp)
        self.tol = tolerance

    def __step__(self, q, dt: float):
        b = q + 0.5 * dt * self.rhs_exp(q)

        def g(v):
            return v - 0.5 * dt * self.rhs_imp(v) - b

        y1, num_iter, _res = newton_krylov(g, q, f_tol=self.tol)
        self.solver_info = SolverInfo(total_num_it=num_iter)
        return q + dt * (self.rhs_imp(y1) + self.rhs_exp(y1))


class RosExp2(Integrator):
    """Exponential-then-implicit hybrid (reference rosexp2.py:12-77):
    phi propagation with J_full - J_imp, then a (I - dt/2 J_imp) solve."""

    def __init__(self, rhs_full: Callable, rhs_imp: Callable, tolerance: float = 1e-7,
                 restart: int = 20, **kwargs):
        super().__init__(**kwargs)
        self.rhs_full = jax.jit(rhs_full)
        self.rhs_imp = jax.jit(rhs_imp)
        self.tol = tolerance
        self.restart = restart
        self._jvp_full = _jitted_jvp(rhs_full)
        self._jvp_imp = _jitted_jvp(rhs_imp)

    def __step__(self, q, dt: float):
        f_full = np.asarray(self.rhs_full(q)).ravel()
        n = f_full.size

        def j_exp(v):
            vj = jnp.asarray(v)
            return np.asarray(self._jvp_full(q, vj, dt) - self._jvp_imp(q, vj, dt))

        vec = np.zeros((2, n))
        vec[1, :] = f_full
        phiv, stats = pmex([1.0], j_exp, vec, tol=self.tol)

        def a_op(v):
            return v - 0.5 * np.asarray(self._jvp_imp(q, jnp.asarray(v), dt))

        q_flat = np.asarray(q).ravel()
        b = a_op(q_flat) + phiv[0] * dt
        x, norm_r, norm_b, num_iter, flag, residuals = fgmres(
            a_op, b, x0=q_flat.copy(), tol=self.tol, restart=self.restart
        )
        self.solver_info = SolverInfo(total_num_it=stats.krylov_steps + num_iter,
                                      converged=(flag == 0), residuals=residuals)
        return jnp.asarray(x).reshape(q.shape)


class PartRosExp2(Integrator):
    """Implicit-then-exponential partitioned hybrid (reference
    partrosexp2.py:13-90): vec rows [f_imp/2, f_exp], same implicit solve."""

    def __init__(self, rhs_full: Callable, rhs_imp: Callable, tolerance: float = 1e-7,
                 restart: int = 20, **kwargs):
        super().__init__(**kwargs)
        self.rhs_full = jax.jit(rhs_full)
        self.rhs_imp = jax.jit(rhs_imp)
        self.tol = tolerance
        self.restart = restart
        self._jvp_full = _jitted_jvp(rhs_full)
        self._jvp_imp = _jitted_jvp(rhs_imp)

    def __step__(self, q, dt: float):
        f_full = self.rhs_full(q)
        f_imp = self.rhs_imp(q)
        f_imp_flat = np.asarray(f_imp).ravel()
        f_exp_flat = np.asarray(f_full - f_imp).ravel()
        n = f_imp_flat.size

        def j_exp(v):
            vj = jnp.asarray(v)
            return np.asarray(self._jvp_full(q, vj, dt) - self._jvp_imp(q, vj, dt))

        vec = np.zeros((2, n))
        vec[0, :] = 0.5 * f_imp_flat
        vec[1, :] = f_exp_flat
        phiv, stats = pmex([1.0], j_exp, vec, tol=self.tol)

        def a_op(v):
            return v - 0.5 * np.asarray(self._jvp_imp(q, jnp.asarray(v), dt))

        q_flat = np.asarray(q).ravel()
        b = a_op(q_flat) + (phiv[0] + 0.5 * f_imp_flat) * dt
        x, norm_r, norm_b, num_iter, flag, residuals = fgmres(
            a_op, b, x0=q_flat.copy(), tol=self.tol, restart=self.restart
        )
        self.solver_info = SolverInfo(total_num_it=stats.krylov_steps + num_iter,
                                      converged=(flag == 0), residuals=residuals)
        return jnp.asarray(x).reshape(q.shape)


class SdirkLstable(Integrator):
    """L-stable 2-stage SDIRK with gamma = 1 + 1/sqrt(2)
    (reference sdirk.py:14-60), stages solved by Newton-Krylov."""

    def __init__(self, rhs: Callable, tolerance: float = 1e-7, **kwargs):
        super().__init__(**kwargs)
        self.rhs = jax.jit(rhs)
        self.tol = tolerance
        self.gamma = 1.0 + 1.0 / np.sqrt(2.0)

    def __step__(self, q, dt: float):
        g = self.gamma

        def sys1(y):
            return (y - q) / dt - g * self.rhs(y)

        y1, it1, _r1 = newton_krylov(sys1, q, f_tol=self.tol)
        f1 = self.rhs(y1)

        def sys2(y):
            return (y - q) / dt - (1.0 - 2.0 * g) * f1 - g * self.rhs(y)

        y2, it2, _r2 = newton_krylov(sys2, q, f_tol=self.tol)
        self.solver_info = SolverInfo(total_num_it=it1 + it2)
        return q + dt * 0.5 * (self.rhs(y1) + self.rhs(y2))
