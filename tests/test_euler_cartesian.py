"""End-to-end tests of the 2D Cartesian Euler DFR slice (rising bubble lab).

Mirrors the role of the reference's small_cartesian2d integration problem
(tests/integration/) with physics-based checks: hydrostatic balance,
conservation, symmetry, and temporal self-convergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wxfactory_tpu.common.constants import CPD, CVD, GRAVITY, P0, RD
from wxfactory_tpu.geometry.cartesian import make_cartesian_2d
from wxfactory_tpu.integrators import Euler1, Tvdrk3
from wxfactory_tpu.models import make_rhs_euler_cartesian
from wxfactory_tpu.ops import make_dfr_operators
from wxfactory_tpu.testcases import initialize_cartesian2d


def _setup(s=4, nx=8, nz=12, case=2):
    ops = make_dfr_operators(s)
    geom = make_cartesian_2d((0, 1000), (0, 1500), nx, nz, s)
    q0 = initialize_cartesian2d(geom, case)
    rhs = make_rhs_euler_cartesian(geom, ops)
    return geom, q0, rhs


def test_hydrostatic_state_is_steady():
    geom, q0, rhs = _setup()
    theta = 303.15
    exner = 1.0 - GRAVITY / (CPD * theta) * geom.X3
    rho = P0 / (RD * theta) * exner ** (CVD / RD)
    qh = np.zeros_like(q0)
    qh[0] = rho
    qh[3] = rho * theta
    r = jax.jit(rhs)(jnp.asarray(qh))
    # Momentum tendencies vanish to discretization error, mass/theta exactly.
    assert float(jnp.abs(r[0]).max()) == 0.0
    assert float(jnp.abs(r[3]).max()) == 0.0
    assert float(jnp.abs(r[1]).max()) < 1e-8
    assert float(jnp.abs(r[2]).max()) < 1e-7


def test_bubble_conservation_and_symmetry():
    geom, q0, rhs = _setup()
    ops = make_dfr_operators(4)
    # Discrete mass integral: Gauss-Legendre weighted sum over every element.
    w2 = np.outer(ops.weights, ops.weights).reshape(-1)

    def integral(field):
        return float((np.asarray(field) * w2).sum())

    stepper = Tvdrk3(rhs)
    q = jnp.asarray(q0)
    mass0 = integral(q[0])
    theta_mass0 = integral(q[3])
    for _ in range(50):
        q = stepper.step(q, 0.02)
    assert not bool(jnp.isnan(q).any())
    # Rigid walls: mass and rho*theta are conserved (walls flux only momentum)
    assert abs(integral(q[0]) - mass0) / mass0 < 1e-11
    assert abs(integral(q[3]) - theta_mass0) / theta_mass0 < 1e-11
    # The configuration is mirror-symmetric about x = 500
    blk = geom.to_single_block(np.asarray(q))
    th = blk[3] / blk[0]
    assert np.abs(th - th[:, ::-1]).max() < 1e-9
    # Bubble amplitude bounded by initial perturbation (small DG overshoot OK)
    assert th.max() < 303.15 + 0.5 + 1e-3
    assert th.min() > 303.15 - 1e-3


def test_temporal_self_convergence_tvdrk3():
    _, q0, rhs = _setup(s=3, nx=5, nz=8)
    q0 = jnp.asarray(q0)

    def advance(dt, nsteps):
        stepper = Tvdrk3(rhs)
        q = q0
        for _ in range(nsteps):
            q = stepper.step(q, dt)
        return q

    t_final = 0.64
    q_ref = advance(0.005, 128)
    e1 = float(jnp.abs(advance(0.04, 16) - q_ref).max())
    e2 = float(jnp.abs(advance(0.02, 32) - q_ref).max())
    order = np.log2(e1 / e2)
    assert order > 2.5, (e1, e2, order)


def test_euler1_first_order():
    _, q0, rhs = _setup(s=3, nx=5, nz=8)
    q0 = jnp.asarray(q0)

    def advance(integ_cls, dt, nsteps):
        stepper = integ_cls(rhs)
        q = q0
        for _ in range(nsteps):
            q = stepper.step(q, dt)
        return q

    q_ref = advance(Tvdrk3, 0.0025, 128)
    e1 = float(jnp.abs(advance(Euler1, 0.02, 16) - q_ref).max())
    e2 = float(jnp.abs(advance(Euler1, 0.01, 32) - q_ref).max())
    order = np.log2(e1 / e2)
    assert 0.7 < order < 1.5, (e1, e2, order)


def test_rhs_matches_reference_stage_structure():
    """The RHS of a state with zero velocity has zero mass/theta tendency
    (flux of rho and rho*theta is proportional to velocity)."""
    _, q0, rhs = _setup()
    r = jax.jit(rhs)(jnp.asarray(q0))
    assert float(jnp.abs(r[0]).max()) == 0.0
    assert float(jnp.abs(r[3]).max()) == 0.0
