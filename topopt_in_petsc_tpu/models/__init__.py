from topopt_in_petsc_tpu.models.elements import (
    hex8_stiffness,
    helmholtz_element_matrices,
)
from topopt_in_petsc_tpu.models.elasticity import LinearElasticity

__all__ = [
    "hex8_stiffness",
    "helmholtz_element_matrices",
    "LinearElasticity",
]
