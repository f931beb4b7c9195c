from .cartesian import initialize_cartesian2d
from .dcmip import (
    acoustic_wave,
    dcmip_advection_deformation,
    dcmip_advection_hadley,
    dcmip_gravity_wave,
    dcmip_schar_waves,
    dcmip_steady_state_mountain,
)
from .matsuno import case_matsuno, eval_field
from .shallow_water import (
    circular_vortex,
    height_vortex,
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
    "case_matsuno",
    "circular_vortex",
    "eval_field",
    "height_vortex",
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
