"""FST (ECCC RPN standard format) output.

Capability parity with the reference's output/output_cubesphere_fst.py:
an fst24 (RSF) file carrying the cubed-sphere grid descriptor — the grid
rotation encoded into IG1-IG3 with the 24-bit angle codec
(common/angle24.py) and the discretization into IG4 — plus one 64-bit real
record per output field (reference output_cubesphere_fst.py:39-148).

The proprietary ``rmn``/``georef`` libraries are optional in the reference
too (it raises when ``rmn`` is missing, output_cubesphere_fst.py:56); the
import here is lazy so the writer logic is testable against a recorded fake
``rmn`` module (tests/test_framework.py).
"""

import numpy as np

from ..common.angle24 import decode, encode  # noqa: F401  (re-exported)


def _get_rmn():
    try:
        import rmn

        return rmn
    except ImportError:
        return None


def make_ig4(num_elem_horizontal: int, num_solpts: int) -> int:
    """Pack the horizontal discretization into the IG4 integer descriptor
    (17 bits of element count, 7 bits of solution points — reference
    output_cubesphere_fst.py:31-36)."""
    if num_elem_horizontal > 0x1FFFF:
        raise ValueError(f"Num elem ({num_elem_horizontal}) is too large to be encoded (max {0x1FFFF})")
    if not 1 <= num_solpts <= 127:
        raise ValueError(f"Num solpts ({num_solpts}) must be in [1, 127]")
    return ((num_elem_horizontal & 0x1FFFF) << 7) | num_solpts


def grid_rotation_metadata(geom) -> tuple:
    """IG1-IG4 integer metadata: angle24-encoded grid rotation + packed
    discretization (reference output_cubesphere_fst.py:61-64)."""
    ig1 = encode(geom.lambda0)
    ig2 = encode(geom.phi0)
    ig3 = encode(geom.alpha0)
    ig4 = make_ig4(getattr(geom, "num_elements", getattr(geom, "nel_h", 0)), geom.num_solpts)
    return ig1, ig2, ig3, ig4


class FstWriter:
    """Writes shallow-water fields (h, U, V — physical winds) as FST
    records; the 2D cubed-sphere is laid out as the reference's single
    block: ni = nel*s points per panel row, nj = 6*ni stacked panels."""

    def __init__(self, path: str, geom, metric, ops, equations: str, dt: float = 0.0):
        rmn = _get_rmn()
        if rmn is None:
            raise RuntimeError(
                "FST output requires the ECCC 'rmn' package, which is not available "
                "in this environment (the reference has the same optional dependency, "
                "output_cubesphere_fst.py:56). Use output_format=netcdf instead."
            )
        if equations != "shallow_water":
            raise ValueError(
                f"FST output supports the 2D cubed sphere only (reference "
                f"output_cubesphere_fst.py:144 raises for anything else), got {equations!r}"
            )
        self._rmn = rmn
        self.geom = geom
        self.dt = dt
        self.ig1, self.ig2, self.ig3, self.ig4 = grid_rotation_metadata(geom)

        ni = geom.num_elements * geom.num_solpts
        self.ni, self.nj, self.nk = ni, 6 * ni, 1

        self.file = rmn.fst24_file(path, "RSF+R/W")
        # Grid descriptor record via georef when present (the reference
        # builds a TGeoRef over the same IGs, output_cubesphere_fst.py:96-98).
        try:
            import georef

            self.georef = georef.TGeoRef(
                self.ni, self.nj, "C", self.ig1, self.ig2, self.ig3, self.ig4, file=self.file
            )
            self.georef.write("my_grid", self.file)
        except ImportError:
            self.georef = None

    def _make_record(self, name: str, step_id: int, data: np.ndarray):
        rmn = self._rmn
        return rmn.fst_record(
            data_bits=64,
            pack_bits=64,
            data_type=rmn.FstDataType.FST_TYPE_REAL,
            data=np.ascontiguousarray(data, dtype=np.float64),
            dateo=0,
            datev=0,
            deet=int(self.dt),
            npas=step_id,
            ni=self.ni,
            nj=self.nj,
            nk=self.nk,
            ip1=1,
            ip2=2,
            ip3=3,
            ig1=self.ig1,
            ig2=self.ig2,
            ig3=self.ig3,
            ig4=self.ig4,
            nomvar=name[:4],
            typvar="A",
            grtyp="C",
        )

    def write_sw(self, step_id: int, q: np.ndarray):
        """One record per field: h, and the physical winds U, V (the
        reference computes all three, output_cubesphere_fst.py:134-141)."""
        geom = self.geom
        h = np.asarray(q[0])
        u1, u2 = np.asarray(q[1]) / h, np.asarray(q[2]) / h
        u, v = geom.contra2wind(u1, u2)
        for name, fld in (("h", h), ("U", np.asarray(u)), ("V", np.asarray(v))):
            block = geom.to_single_block(fld)  # (6, ni, ni)
            rec = self._make_record(name, step_id, block.reshape(self.nj, self.ni))
            self.file.write(rec, rewrite=0)

    def close(self):
        if self.file is not None:
            self.file.close()
            self.file = None
