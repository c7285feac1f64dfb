from topopt_in_petsc_tpu.models.elements import (
    hex8_stiffness,
    helmholtz_element_matrices,
    galerkin_octant_matrices,
)

# NOTE: models.elasticity is intentionally NOT imported here — it pulls in
# solvers.multigrid which itself needs models.elements, and importing the
# solver stack before the package would cycle.  Import it via its module
# path: `from topopt_in_petsc_tpu.models.elasticity import LinearElasticity`.

__all__ = [
    "hex8_stiffness",
    "helmholtz_element_matrices",
    "galerkin_octant_matrices",
]
