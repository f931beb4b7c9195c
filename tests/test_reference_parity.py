"""Golden parity tests: run the ACTUAL reference implementation (in-process,
6 fake-MPI lockstep threads — tools/ref_harness.py) and compare initial
conditions and RHS evaluations pointwise.

This is the strongest correctness guarantee in the suite: it exercises the
geometry, metric, DFR operators, panel-edge halo exchange (flips + vector
basis rotations), AUSM fluxes, topography and forcing terms end to end
against the reference's own numerics.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from ref_harness import reference_sw_case  # noqa: E402

from wxfactory_tpu.geometry import make_cubed_sphere_2d, make_metric_2d  # noqa: E402
from wxfactory_tpu.models import make_rhs_shallow_water  # noqa: E402
from wxfactory_tpu.ops.dfr import make_dfr_operators  # noqa: E402
from wxfactory_tpu.testcases import williamson_case2, williamson_case5, williamson_case6  # noqa: E402

CASES = [
    (2, (0.0, 0.0, 0.0)),
    (2, (-0.3, 0.2, -0.15)),  # rotated grid
    (5, (0.0, 0.0, 0.0)),  # topography
    (6, (0.0, 0.0, 0.0)),
]


@pytest.mark.parametrize("case_number,rotation", CASES)
def test_sw_rhs_matches_reference(case_number, rotation):
    nel, s = 3, 3
    l0, p0, a0 = rotation
    q_ref, dq_ref = reference_sw_case(case_number, nel, s, l0, p0, a0)

    geom = make_cubed_sphere_2d(nel, s, lambda0=l0, phi0=p0, alpha0=a0)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)

    if case_number == 2:
        q_mine, topo = williamson_case2(geom), None
    elif case_number == 5:
        q_mine, topo = williamson_case5(geom, ops)
    elif case_number == 6:
        q_mine, topo = williamson_case6(geom), None
    else:
        raise ValueError(case_number)

    scale_q = np.abs(q_ref).max()
    assert np.abs(q_mine - q_ref).max() / scale_q < 1e-13, "initial condition mismatch"

    rhs = make_rhs_shallow_water(geom, ops, metric, topo=topo)
    dq_mine = np.asarray(rhs(jnp.asarray(q_ref)))
    scale_dq = np.abs(dq_ref).max()
    assert np.abs(dq_mine - dq_ref).max() / scale_dq < 1e-11, "RHS mismatch"
