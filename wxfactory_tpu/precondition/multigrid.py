"""p-Multigrid preconditioner for the implicit/rational system.

Capability parity with the reference's precondition/multigrid.py +
smoother.py + common/interpolation.py: a V-cycle over polynomial orders
p -> p-1 -> ... -> 1, each level with its own DFR operators and RHS,
modal-projection transfers (ops.dfr.remesh_operator), and pseudo-time
Runge-Kutta smoothers (erk1 / erk3). The reference keeps this component
gated off at run time (simulation.py:274-275 there raises); here it is
functional for the 2D Cartesian Euler system and exposed through the same
config fields (num_mg_levels, num_pre/post_smoothe, pseudo_cfl,
mg_smoother, mg_solve_coarsest).

The preconditioned operator is the rational system A = I - dt/2 J with
J the exact jvp of each level's RHS around the restricted state.
"""

from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.cartesian import Cartesian2D, make_cartesian_2d
from ..models.euler_cartesian import make_rhs_euler_cartesian
from ..models.euler_cartesian_fv import make_rhs_euler_cartesian_fv
from ..ops.dfr import make_dfr_operators, remesh_operator
from ..ops.quadrature import gauss_legendre


def _remesh_2d(src_pts, dst_pts) -> np.ndarray:
    """2D tensor-product modal transfer acting on the trailing s^2 axis."""
    r1 = remesh_operator(src_pts, dst_pts)
    return np.kron(r1, r1).T  # applied as q @ op


class MultigridLevel:
    def __init__(self, geom: Cartesian2D, num_solpts: int):
        self.num_solpts = num_solpts
        self.geom = make_cartesian_2d(
            geom.domain_x, geom.domain_z, geom.num_elements_x, geom.num_elements_z, max(num_solpts, 1)
        )
        if num_solpts >= 2:
            self.ops = make_dfr_operators(num_solpts)
            self.rhs = make_rhs_euler_cartesian(self.geom, self.ops)
        else:
            self.ops = None
            base = make_rhs_euler_cartesian_fv(self.geom)
            s = self.geom.num_solpts  # == 1

            def rhs(q):
                return base(q[..., 0])[..., None]

            self.rhs = rhs

        @jax.jit
        def jvp(q, v, half_dt):
            return v - half_dt * jax.jvp(self.rhs, (q,), (v,))[1]

        self._rat = jvp
        self.state = None
        self.half_dt = 0.0

    def apply_A(self, v):
        return self._rat(self.state, v, self.half_dt)


class Multigrid:
    """V-cycle preconditioner; callable on flat vectors (FGMRES contract)."""

    def __init__(
        self,
        geom: Cartesian2D,
        num_levels: int = 2,
        num_pre_smoothe: int = 1,
        num_post_smoothe: int = 1,
        pseudo_cfl: float = 5.0,
        smoother: str = "erk3",
        solve_coarsest: bool = False,
        spectral_radii=None,
    ):
        p0 = geom.num_solpts
        orders = [max(p0 - i, 1) for i in range(num_levels)]
        self.levels: List[MultigridLevel] = [MultigridLevel(geom, p) for p in orders]
        self.num_pre = num_pre_smoothe
        self.num_post = num_post_smoothe
        self.pseudo_cfl = pseudo_cfl
        self.smoother = smoother
        self.solve_coarsest = solve_coarsest
        self.spectral_radii = list(spectral_radii or [2.0])

        # Transfer operators between consecutive levels (trailing s^2 axis).
        self.restrict_ops = []
        self.prolong_ops = []
        for fine, coarse in zip(self.levels[:-1], self.levels[1:]):
            _, fine_pts, _ = gauss_legendre(fine.geom.num_solpts)
            _, coarse_pts, _ = gauss_legendre(coarse.geom.num_solpts)
            self.restrict_ops.append(jnp.asarray(_remesh_2d(fine_pts, coarse_pts)))
            self.prolong_ops.append(jnp.asarray(_remesh_2d(coarse_pts, fine_pts)))

        self.shape = None

    # ------------------------------------------------------------------
    def prepare(self, dt: float, q) -> None:
        """Freeze the linearization point on every level."""
        q = jnp.asarray(q)
        self.shape = q.shape
        state = q
        for i, level in enumerate(self.levels):
            level.state = state
            level.half_dt = 0.5 * dt
            if i < len(self.restrict_ops):
                state = state @ self.restrict_ops[i]

    def _smooth(self, level: MultigridLevel, x, b, iterations: int):
        """Smoothing of A x = b. Schemes mirror the reference smoother family
        (smoother.py:25-340): erk1/erk3 pseudo-time RK, 'exp' Chebyshev
        iteration over an estimated spectral interval, 'kiops' exponential
        pseudo-time step; 'ark3' runs as erk3 (the additive splitting the
        reference uses there has no separate stiff part in this operator)."""
        tau = self.pseudo_cfl / (4.0 * level.geom.num_elements_x * max(level.num_solpts, 1) ** 2)

        if self.smoother == "exp":
            # Chebyshev smoothing on [lmin, lmax] of A (A = I - dt/2 J is
            # positive-real for dissipative J); radii from the config list.
            idx = min(self.levels.index(level), len(self.spectral_radii) - 1)
            lmax = self.spectral_radii[idx]
            lmin = lmax / 30.0
            theta = 0.5 * (lmax + lmin)
            delta = 0.5 * (lmax - lmin)
            sigma = theta / delta
            rho_prev = 1.0 / sigma
            r = b - level.apply_A(x)
            d = r / theta
            for _ in range(max(iterations, 1) * 3):
                x = x + d
                r = b - level.apply_A(x)
                rho = 1.0 / (2.0 * sigma - rho_prev)
                d = rho * rho_prev * d + 2.0 * rho / delta * r
                rho_prev = rho
            return x + d

        if self.smoother == "kiops":
            # Exponential pseudo-time smoothing: x += tau*phi1(-tau A) r
            # (reference smoother.py KiopsSmoother), at loose tolerance with
            # a tiny Krylov space.
            from ..solvers import kiops as kiops_solver

            shape = x.shape

            def neg_tau_A(v):
                return -tau * np.asarray(level.apply_A(jnp.asarray(v.reshape(shape)))).ravel()

            for _ in range(iterations):
                r = np.asarray(b - level.apply_A(x)).ravel()
                vec = np.zeros((2, r.size))
                vec[1] = tau * r
                w, _stats = kiops_solver([1.0], neg_tau_A, vec, tol=1e-2, m_init=4, mmin=4, mmax=16)
                x = x + jnp.asarray(w[0]).reshape(shape)
            return x

        for _ in range(iterations):
            if self.smoother == "erk1":
                x = x + tau * (b - level.apply_A(x))
            else:  # erk3 / ark3: 3-stage pseudo-time RK (smoother.py RK3)
                r = b - level.apply_A(x)
                x1 = x + tau / 3.0 * r
                r1 = b - level.apply_A(x1)
                x2 = x + 0.5 * tau * r1
                r2 = b - level.apply_A(x2)
                x = x + tau * r2
        return x

    def _cycle(self, idx: int, b):
        level = self.levels[idx]
        x = jnp.zeros_like(b)
        x = self._smooth(level, x, b, self.num_pre)

        if idx + 1 < len(self.levels):
            residual = b - level.apply_A(x)
            b_coarse = residual @ self.restrict_ops[idx]
            x_coarse = self._cycle(idx + 1, b_coarse)
            x = x + x_coarse @ self.prolong_ops[idx]
        elif self.solve_coarsest:
            x = self._smooth(level, x, b, 10 * max(self.num_pre, 1))

        return self._smooth(level, x, b, self.num_post)

    def __call__(self, v):
        b = jnp.asarray(v).reshape(self.shape)
        return np.asarray(self._cycle(0, b)).ravel()
