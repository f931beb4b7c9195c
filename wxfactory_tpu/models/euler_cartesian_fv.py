"""First-order finite-volume 2D Cartesian Euler RHS.

Capability parity with the reference's rhs/rhs_fv.py + the FV common fluxes
of pde/fluxes.py (ausm_2d_fv, upwind_2d_fv, rusanov_2d_fv): cell-centered
states serve as both interface states (no reconstruction), a selectable
common flux, rigid-wall boundaries, gravity source. This is the coarse
operator of the FV multigrid preconditioner and a standalone discretization
(config: discretization = fv).

State: ``Q[4, ncell_z, ncell_x]`` = [rho, rho*u, rho*w, rho*theta].
"""

from typing import Callable

import jax.numpy as jnp

from ..common.constants import (
    GRAVITY,
    HEAT_CAPACITY_RATIO,
    IDX_2D_RHO,
    IDX_2D_RHO_THETA,
    IDX_2D_RHO_U,
    IDX_2D_RHO_W,
)
from ..geometry.cartesian import Cartesian2D
from .euler_cartesian import pressure


def _ausm(qL, qR, pL, pR, normal: int):
    aL = jnp.sqrt(HEAT_CAPACITY_RATIO * pL / qL[IDX_2D_RHO])
    aR = jnp.sqrt(HEAT_CAPACITY_RATIO * pR / qR[IDX_2D_RHO])
    mL = qL[normal] / (qL[IDX_2D_RHO] * aL)
    mR = qR[normal] / (qR[IDX_2D_RHO] * aR)
    m = 0.25 * ((mL + 1.0) ** 2 - (mR - 1.0) ** 2)
    flux = qL * jnp.maximum(0.0, m) * aL + qR * jnp.minimum(0.0, m) * aR
    return flux.at[normal].add(0.5 * ((1.0 + mL) * pL + (1.0 - mR) * pR))


def _rusanov(qL, qR, pL, pR, normal: int):
    aL = jnp.sqrt(HEAT_CAPACITY_RATIO * pL / qL[IDX_2D_RHO])
    aR = jnp.sqrt(HEAT_CAPACITY_RATIO * pR / qR[IDX_2D_RHO])
    vL = qL[normal] / qL[IDX_2D_RHO]
    vR = qR[normal] / qR[IDX_2D_RHO]
    eig = jnp.maximum(jnp.abs(vL) + aL, jnp.abs(vR) + aR)
    fL = qL * vL
    fL = fL.at[normal].add(pL)
    fR = qR * vR
    fR = fR.at[normal].add(pR)
    return 0.5 * (fL + fR - eig * (qR - qL))


def _upwind(qL, qR, pL, pR, normal: int):
    vsum = qL[normal] + qR[normal]
    fL = qL * (qL[normal] / qL[IDX_2D_RHO])
    fL = fL.at[normal].add(pL)
    fR = qR * (qR[normal] / qR[IDX_2D_RHO])
    fR = fR.at[normal].add(pR)
    return jnp.where(vsum > 0, fL, fR)


_FLUXES = {"ausm": _ausm, "rusanov": _rusanov, "upwind": _upwind}


def make_rhs_euler_cartesian_fv(geom: Cartesian2D, flux: str = "ausm") -> Callable:
    """Build the FV RHS on the element grid of `geom` (one cell per element,
    i.e. the num_solpts=1 view)."""
    riemann = _FLUXES[flux]
    dx = geom.delta_x1
    dz = geom.delta_x3

    def rhs(q: jnp.ndarray) -> jnp.ndarray:
        q = q.reshape(q.shape[:3]) if q.ndim == 4 else q  # accept (4, nz, nx, 1)
        p = pressure(q[IDX_2D_RHO_THETA])

        # Horizontal interfaces (interior).
        fx = riemann(q[:, :, :-1], q[:, :, 1:], p[:, :-1], p[:, 1:], IDX_2D_RHO_U)
        # Rigid walls: pressure-only flux.
        zerocol = jnp.zeros_like(fx[:, :, :1])
        wall_w = zerocol.at[IDX_2D_RHO_U].set(p[:, :1])
        wall_e = zerocol.at[IDX_2D_RHO_U].set(p[:, -1:])
        fx_all = jnp.concatenate([wall_w, fx, wall_e], axis=2)  # (4, nz, nx+1)

        fz = riemann(q[:, :-1, :], q[:, 1:, :], p[:-1, :], p[1:, :], IDX_2D_RHO_W)
        zerorow = jnp.zeros_like(fz[:, :1, :])
        wall_b = zerorow.at[IDX_2D_RHO_W].set(p[:1, :])
        wall_t = zerorow.at[IDX_2D_RHO_W].set(p[-1:, :])
        fz_all = jnp.concatenate([wall_b, fz, wall_t], axis=1)  # (4, nz+1, nx)

        out = -(fx_all[:, :, 1:] - fx_all[:, :, :-1]) / dx - (fz_all[:, 1:, :] - fz_all[:, :-1, :]) / dz
        return out.at[IDX_2D_RHO_W].add(-q[IDX_2D_RHO] * GRAVITY)

    return rhs
