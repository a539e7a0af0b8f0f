from .lorentz import (
    magnetic_field_cc,
    magnetic_field_faces,
    lorentz_force_jacobian,
    lorentz_force_divergence,
)
from .coriolis import FPlane
from .diffusion import LaplacianDiffusion, BiharmonicDiffusion

__all__ = [
    "magnetic_field_cc", "magnetic_field_faces",
    "lorentz_force_jacobian", "lorentz_force_divergence",
    "FPlane", "LaplacianDiffusion", "BiharmonicDiffusion",
]
