from .cartesian import initialize_cartesian2d
from .dcmip import acoustic_wave, dcmip_gravity_wave
from .shallow_water import (
    case_galewsky,
    case_unsteady_zonal,
    height_case1,
    height_case2,
    solid_body_rotation,
    williamson_case1,
    williamson_case2,
    williamson_case5,
    williamson_case6,
)

__all__ = [
    "acoustic_wave",
    "dcmip_gravity_wave",
    "initialize_cartesian2d",
    "solid_body_rotation",
    "williamson_case1",
    "williamson_case2",
    "williamson_case5",
    "williamson_case6",
    "case_galewsky",
    "case_unsteady_zonal",
    "height_case1",
    "height_case2",
]
