"""NetCDF field output: write through the (scipy-fallback) writer, re-read
the file, and verify the variable set and values match the reference
writer's contract (output/output_cubesphere_netcdf.py:134-270,331-367):
SW -> h, U, V, RV, PV; Euler -> rho, U, V, W, theta, P."""

import numpy as np
from scipy.io import netcdf_file

from wxfactory_tpu.common.constants import CPD, CVD, P0, RD
from wxfactory_tpu.geometry import make_cubed_sphere_2d, make_metric_2d
from wxfactory_tpu.geometry.cubed_sphere_3d import make_cubed_sphere_3d
from wxfactory_tpu.geometry.metric3d import make_metric_3d
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.output.netcdf import make_writer
from wxfactory_tpu.testcases import williamson_case5, williamson_case6
from wxfactory_tpu.testcases.dcmip import dcmip_gravity_wave


def test_sw_netcdf_write_and_reread(tmp_path):
    nel, s = 4, 3
    geom = make_cubed_sphere_2d(nel, s)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)
    q = williamson_case6(geom)

    path = str(tmp_path / "case6.nc")
    w = make_writer(path, geom, metric, ops, "shallow_water")
    assert w is not None, "scipy fallback backend must be available"
    w.write_sw(0.0, q)
    w.write_sw(1800.0, q * 1.01)
    w.close()

    f = netcdf_file(path, "r", mmap=False)
    assert set(f.variables) >= {"time", "lat", "lon", "h", "U", "V", "RV", "PV"}
    ni = nel * s
    assert f.variables["h"].shape == (2, 6, ni, ni)
    np.testing.assert_allclose(f.variables["time"][:], [0.0, 1800.0])

    # Values round-trip: h matches the block view of the state; lat/lon in
    # degrees; winds consistent with contra2wind.
    np.testing.assert_allclose(f.variables["h"][0], geom.to_single_block(q[0]), rtol=1e-12)
    np.testing.assert_allclose(f.variables["h"][1], geom.to_single_block(1.01 * q[0]), rtol=1e-12)
    np.testing.assert_allclose(f.variables["lat"][:], np.degrees(geom.to_single_block(geom.lat)), rtol=1e-12)
    assert np.abs(f.variables["lat"][:]).max() <= 90.0 + 1e-9
    u, v = geom.contra2wind(q[1] / q[0], q[2] / q[0])
    np.testing.assert_allclose(f.variables["U"][0], geom.to_single_block(np.asarray(u)), rtol=1e-9)
    np.testing.assert_allclose(f.variables["V"][0], geom.to_single_block(np.asarray(v)), rtol=1e-9, atol=1e-9)
    assert np.isfinite(f.variables["RV"][:]).all()
    assert np.isfinite(f.variables["PV"][:]).all()
    f.close()


def test_sw_topography_adds_surface_height(tmp_path):
    # Case 5: the written h is the TOTAL height h + hsurf (reference
    # output_cubesphere_netcdf.py:313-315).
    nel, s = 4, 3
    geom = make_cubed_sphere_2d(nel, s)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)
    q, topo = williamson_case5(geom, ops)

    path = str(tmp_path / "case5.nc")
    w = make_writer(path, geom, metric, ops, "shallow_water", topo=topo)
    w.write_sw(0.0, q)
    w.close()

    f = netcdf_file(path, "r", mmap=False)
    np.testing.assert_allclose(
        f.variables["h"][0], geom.to_single_block(q[0] + topo.hsurf), rtol=1e-12
    )
    f.close()


def test_euler_netcdf_write_and_reread(tmp_path):
    nel_h, nel_v, s, ztop = 4, 2, 2, 10000.0
    from conftest import cs3d_setup
    geom, ops, _topo, metric = cs3d_setup(nel_h, nel_v, s, ztop)
    q = dcmip_gravity_wave(geom)

    path = str(tmp_path / "dcmip31.nc")
    w = make_writer(path, geom, metric, ops, "euler")
    w.write_euler(0.0, q)
    w.close()

    f = netcdf_file(path, "r", mmap=False)
    assert set(f.variables) >= {"time", "lat", "lon", "rho", "U", "V", "W", "theta", "P"}
    ni, nk = nel_h * s, nel_v * s
    assert f.variables["rho"].shape == (1, nk, 6, ni, ni)

    # rho/theta/P round-trip vs direct computation on the state.
    rho = np.asarray(q[0])
    theta = np.asarray(q[4]) / rho
    pressure = P0 * (np.asarray(q[4]) * RD / P0) ** (CPD / CVD)

    def blk(a):
        b = a.reshape(6, nel_v, nel_h, nel_h, s, s, s)
        return np.transpose(b, (1, 4, 0, 2, 5, 3, 6)).reshape(nk, 6, ni, ni)

    np.testing.assert_allclose(f.variables["rho"][0], blk(rho), rtol=1e-12)
    np.testing.assert_allclose(f.variables["theta"][0], blk(theta), rtol=1e-12)
    np.testing.assert_allclose(f.variables["P"][0], blk(pressure), rtol=1e-12)
    u, v, wv = geom.contra2wind_3d(q[1] / rho, q[2] / rho, q[3] / rho, metric)
    np.testing.assert_allclose(f.variables["U"][0], blk(np.asarray(u)), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(f.variables["W"][0], blk(np.asarray(wv)), rtol=1e-9, atol=1e-9)
    f.close()


def test_manager_routes_euler_output(tmp_path):
    # OutputManager writes Euler fields through the same path the SW run
    # uses (frequency gating + file naming).
    from wxfactory_tpu.config import Configuration
    from wxfactory_tpu.output.manager import OutputManager

    nel_h, nel_v, s, ztop = 4, 2, 2, 10000.0
    from conftest import cs3d_setup
    geom, ops, _topo, metric = cs3d_setup(nel_h, nel_v, s, ztop)
    q = dcmip_gravity_wave(geom)

    ini = f"""
[General]
equations = euler
[Grid]
grid_type = cubed_sphere
ztop = {ztop}
[Spatial_discretization]
num_solpts = {s}
num_elements_horizontal = {nel_h}
num_elements_vertical = {nel_v}
[Test_case]
case_number = 31
[Time_integration]
dt = 30.0
t_end = 60.0
time_integrator = tvdrk3
[Output_options]
output_freq = 1
output_dir = {tmp_path}
base_output_file = e3
output_format = netcdf
"""
    cfg = Configuration(ini)
    mgr = OutputManager(cfg, geom, ops, metric)
    mgr.step(q, 0, 0.0)
    mgr.finalize()
    f = netcdf_file(str(tmp_path / "e3.nc"), "r", mmap=False)
    assert "theta" in f.variables and f.variables["theta"].shape[0] == 1
    f.close()
