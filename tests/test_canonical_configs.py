"""The reference's canonical run configurations, end to end:
case6 (SW, epi3 + pmex, dt=1800) and dcmip31 (Euler, epi2 + kiops, dt=30)
— reference config/case6.ini and config/dcmip31.ini. Shrunk grids keep
these SMOKE tests fast; the canonical-SHAPE parity checks live in
test_reference_parity.test_sw_case6_epi3_pmex_canonical_matches_reference
(nel=10, s=3, 5 EPI3+PMEX steps vs the in-process reference) and
test_euler3d.test_epi2_kiops_canonical_shape_matches_reference (12x12x3,
5 EPI2+KIOPS steps). The regression target here is stability of the
exponential path (including the Krylov warm start + the reference's
m <= 64 cap, without which IOP-2 orthogonality loss silently corrupts the
phi solve)."""

import jax.numpy as jnp
import numpy as np

from wxfactory_tpu.geometry import (
    make_cubed_sphere_2d,
    make_cubed_sphere_3d,
    make_metric_2d,
    make_metric_3d,
)
from wxfactory_tpu.integrators import Epi
from wxfactory_tpu.models import make_rhs_euler_cubesphere, make_rhs_shallow_water
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.testcases import dcmip_gravity_wave, williamson_case6


def test_case6_epi3_pmex():
    geom = make_cubed_sphere_2d(6, 3)
    ops = make_dfr_operators(3)
    metric = make_metric_2d(geom)
    rhs = make_rhs_shallow_water(geom, ops, metric)
    q = jnp.asarray(williamson_case6(geom))
    integ = Epi(rhs, order=3, exponential_solver="pmex", tolerance=1e-7)
    for _ in range(3):
        q = integ.step(q, 1800.0)
    qn = np.asarray(q)
    assert np.all(np.isfinite(qn))
    assert 7500.0 < qn[0].min() and qn[0].max() < 11000.0


def test_dcmip31_epi2_kiops():
    geom = make_cubed_sphere_3d(4, 2, 2, 10000.0, planet_scaling_factor=125.0, planet_is_rotating=False)
    ops = make_dfr_operators(2, three_d=True)
    metric = make_metric_3d(geom, ops)
    rhs = make_rhs_euler_cubesphere(geom, ops, metric)
    q = jnp.asarray(dcmip_gravity_wave(geom))
    integ = Epi(rhs, order=2, exponential_solver="kiops", tolerance=1e-7)
    for _ in range(4):
        q = integ.step(q, 30.0)
    qn = np.asarray(q)
    assert np.all(np.isfinite(qn))
    # Density stays near the hydrostatic background (no blow-up).
    assert 0.3 < qn[0].min() and qn[0].max() < 1.5
