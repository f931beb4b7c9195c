"""Ros2: second-order Rosenbrock integrator.

Solves (I - dt/2 J) Q^{n+1} = (I - dt/2 J) Q^n + dt f(Q^n) with FGMRES,
matching the reference's integrators/ros2.py. The rational-form operator
uses an exact jvp Jacobian action.
"""

from time import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..solvers import fgmres
from .base import Integrator, SolverInfo


class Ros2(Integrator):
    def __init__(
        self,
        rhs: Callable,
        tolerance: float = 1e-7,
        gmres_restart: int = 30,
        **kwargs,
    ) -> None:
        super().__init__(**kwargs)
        self.rhs = rhs
        self.tol = tolerance
        self.gmres_restart = gmres_restart

        @jax.jit
        def _rat_apply(q, v, half_dt):
            jv = jax.jvp(rhs, (q,), (v.reshape(q.shape),))[1].ravel()
            return v - half_dt * jv

        self._rat_apply = _rat_apply

        @jax.jit
        def _rhs(q):
            return rhs(q)

        self._rhs = _rhs

    def __step__(self, q, dt: float):
        rhs_q = self._rhs(q)
        q_flat = np.asarray(q).ravel()

        def A(v):
            return np.asarray(self._rat_apply(q, jnp.asarray(v), 0.5 * dt))

        b = A(q_flat) + np.asarray(rhs_q).ravel() * dt

        maxiter = 20000 // self.gmres_restart
        if self.preconditioner is not None:
            maxiter = 400 // self.gmres_restart

        t0 = time()
        q_new, norm_r, norm_b, num_iter, flag, residuals = fgmres(
            A,
            b,
            x0=q_flat,
            tol=self.tol,
            restart=self.gmres_restart,
            maxiter=maxiter,
            preconditioner=self.preconditioner,
            verbose=self.verbose,
        )
        t1 = time()
        self.solver_info = SolverInfo(total_num_it=num_iter, converged=(flag == 0), residuals=residuals)
        self.failure_flag = flag
        if self.verbose > 0:
            kind = "convergence" if flag == 0 else "stagnation"
            print(f"FGMRES {kind} at iteration {num_iter} in {t1-t0:4.3f} s, "
                  f"relative residual {norm_r/norm_b:.2e}", flush=True)

        return jnp.asarray(q_new).reshape(q.shape)
