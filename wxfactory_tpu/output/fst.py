"""FST (ECCC RPN standard format) output.

Capability parity slot for the reference's output/output_cubesphere_fst.py:
requires the proprietary `rmn`/`georef` libraries (optional in the
reference too — it raises when `rmn` is missing, output_cubesphere_fst.py:56).
The grid-rotation metadata encoding via the 24-bit angle codec
(common/angle24.py) is shared with the NetCDF path.
"""

try:
    import rmn  # noqa: F401

    HAVE_RMN = True
except ImportError:
    HAVE_RMN = False

from ..common.angle24 import decode, encode  # noqa: F401  (re-exported)


class FstWriter:
    def __init__(self, path: str, geom, metric, ops, equations: str):
        if not HAVE_RMN:
            raise RuntimeError(
                "FST output requires the ECCC 'rmn' package, which is not available "
                "in this environment (the reference has the same optional dependency). "
                "Use output_format=netcdf instead."
            )
        raise NotImplementedError("rmn available but FST writing not yet implemented")


def grid_rotation_metadata(geom) -> tuple:
    """Encode the grid rotation into the IG1-IG4 integer metadata fields the
    FST format uses (reference output_cubesphere_fst.py:39-148)."""
    ig1 = encode(geom.lambda0)
    ig2 = encode(geom.phi0)
    ig3 = encode(geom.alpha0)
    ig4 = 0
    return ig1, ig2, ig3, ig4
