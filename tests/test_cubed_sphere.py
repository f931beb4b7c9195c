"""Cubed-sphere geometry + panel topology + halo exchange tests.

Strategy mirrors the reference's tests/unit/test_process_topology.py: each
side of every exchange is computed independently (here: analytic evaluation
at the physical edge points) and compared against what the exchange
delivers, including edge flips and vector basis rotations.
"""

import math

import numpy as np
import pytest

from wxfactory_tpu.geometry.cubed_sphere import (
    gnomonic_to_cartesian,
    make_cubed_sphere_2d,
)
from wxfactory_tpu.geometry.metric import make_metric_2d
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.parallel.topology import EAST, NORTH, SOUTH, WEST, CubedSphereTopology, _edge_gnomonic


@pytest.fixture(scope="module")
def geom():
    return make_cubed_sphere_2d(num_elements=4, num_solpts=3)


@pytest.fixture(scope="module")
def geom_rot():
    # Rotated grid: exercises the general panel-parameter branches.
    return make_cubed_sphere_2d(num_elements=3, num_solpts=3, lambda0=-0.3, phi0=0.2, alpha0=-0.15)


@pytest.fixture(scope="module")
def topo(geom):
    return CubedSphereTopology(geom)


def test_panel_adjacency_matches_reference_table(topo):
    # Reference process_topology.py:105-113 (S, N, W, E neighbors per panel).
    expected = [[5, 4, 3, 1], [5, 4, 0, 2], [5, 4, 1, 3], [5, 4, 2, 0], [0, 2, 3, 1], [2, 0, 3, 1]]
    derived = [[topo.edges[p][d].neighbor for d in range(4)] for p in range(6)]
    assert derived == expected


def test_flips_match_reference_table(topo):
    # Reference process_topology.py:128-135.
    expected = [
        [False, False, False, False],
        [True, False, False, False],
        [True, True, False, False],
        [False, True, False, False],
        [False, True, True, False],
        [True, False, False, True],
    ]
    derived = [[topo.edges[p][d].flip for d in range(4)] for p in range(6)]
    assert derived == expected


def test_flip_symmetry(geom_rot):
    t = CubedSphereTopology(geom_rot)
    for p in range(6):
        for d in range(4):
            e = t.edges[p][d]
            back = t.edges[e.neighbor][e.neighbor_side]
            assert back.neighbor == p and back.neighbor_side == d
            assert back.flip == e.flip


def test_sphere_area(geom):
    # sqrtG uses the reference's 3D-Jacobian convention (metric2d.py:130,
    # delta_x1*delta_x2/8 with a unit vertical half-width), so the quadrature
    # sum gives half the sphere's surface area; the constant cancels in the
    # RHS (inv_sqrtG times sqrtG-weighted fluxes).
    ops = make_dfr_operators(geom.num_solpts)
    metric = make_metric_2d(geom)
    w = np.asarray(ops.quad_weights).reshape(-1)
    area = float(np.sum(metric.sqrtG * w))
    # Gauss quadrature of the non-polynomial sqrtG at s=3, nel=4: ~1e-7.
    assert area == pytest.approx(2.0 * math.pi * geom.earth_radius**2, rel=1e-6)


def _eval_on_faces(geom, f):
    """Evaluate f(x, y, z) at all element-face points; returns (itf_i, itf_j)
    arrays of shape (6, ny, nx, 2s) matching the extrapolated-face layout."""
    s = geom.num_solpts
    vals = []
    for X, Y in ((geom.X_itf_i, geom.Y_itf_i), (geom.X_itf_j, geom.Y_itf_j)):
        out = np.empty(X.shape)
        for p in range(6):
            x, y, z = gnomonic_to_cartesian(X[p], Y[p], geom.lon_p[p], geom.lat_p[p], geom.angle_p[p])
            out[p] = f(x, y, z)
        vals.append(out)
    itf_i, itf_j = vals
    return itf_i[:, :, 1:-1, :], itf_j[:, 1:-1, :, :]


def _edge_points_xyz(geom, panel, side):
    X, Y = _edge_gnomonic(geom, side)
    x, y, z = gnomonic_to_cartesian(X, Y, geom.lon_p[panel], geom.lat_p[panel], geom.angle_p[panel])
    return x, y, z


@pytest.mark.parametrize("rotated", [False, True])
def test_scalar_halo_exchange(rotated, geom, geom_rot):
    g = geom_rot if rotated else geom
    t = CubedSphereTopology(g)

    f = lambda x, y, z: x + 2.0 * y + 3.0 * z**2 + 0.5 * x * y * z
    itf_i, itf_j = _eval_on_faces(g, f)
    halos = t.halo_scalars(np.asarray(itf_i), np.asarray(itf_j))

    for p in range(6):
        for d in range(4):
            x, y, z = _edge_points_xyz(g, p, d)
            expected = f(x, y, z)
            got = np.asarray(halos[d][p])
            np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("rotated", [False, True])
def test_vector_halo_exchange(rotated, geom, geom_rot):
    """Exchange of a smooth global wind field: halo contravariant components
    must equal the direct evaluation in the RECEIVING panel's coordinates."""
    g = geom_rot if rotated else geom
    t = CubedSphereTopology(g)

    alpha = 0.4  # rotated solid-body flow (Williamson case-1 style)
    u0 = 38.0

    def wind(lon, lat):
        u = u0 * (np.cos(lat) * math.cos(alpha) + np.sin(lat) * np.cos(lon) * math.sin(alpha))
        v = -u0 * np.sin(lon) * math.sin(alpha)
        return u, v

    def contra_at(X, Y):
        """Contravariant components at gnomonic points (panel-major shape)."""
        lon, lat = g.panel_lonlat(X, Y)
        u, v = wind(lon, lat)
        return g.wind2contra(u, v, X=X, Y=Y)

    u1_i, u2_i = contra_at(g.X_itf_i, g.Y_itf_i)
    u1_j, u2_j = contra_at(g.X_itf_j, g.Y_itf_j)
    mid = lambda a_i, a_j: (a_i[:, :, 1:-1, :], a_j[:, 1:-1, :, :])
    u1_itf_i, u1_itf_j = mid(u1_i, u1_j)
    u2_itf_i, u2_itf_j = mid(u2_i, u2_j)

    halos = t.halo_vectors(
        np.asarray(u1_itf_i), np.asarray(u1_itf_j), np.asarray(u2_itf_i), np.asarray(u2_itf_j)
    )

    for p in range(6):
        for d in range(4):
            X, Y = _edge_gnomonic(g, d)
            Xp = np.broadcast_to(X, (6,) + X.shape)
            Yp = np.broadcast_to(Y, (6,) + Y.shape)
            exp_u1, exp_u2 = contra_at(Xp, Yp)
            got_u1 = np.asarray(halos[d][0][p])
            got_u2 = np.asarray(halos[d][1][p])
            np.testing.assert_allclose(got_u1, exp_u1[p], rtol=1e-10, atol=1e-13)
            np.testing.assert_allclose(got_u2, exp_u2[p], rtol=1e-10, atol=1e-13)


def test_wind_roundtrip(geom_rot):
    g = geom_rot
    u = 25.0 * g.coslat + 3.0 * g.sinlon
    v = 5.0 * g.sinlat * g.coslon
    u1, u2 = g.wind2contra(u, v)
    u_back, v_back = g.contra2wind(u1, u2)
    np.testing.assert_allclose(u_back, u, rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(v_back, v, rtol=1e-11, atol=1e-11)
