from topopt_in_petsc_tpu.solvers.cg import pcg
from topopt_in_petsc_tpu.solvers.chebyshev import (
    chebyshev_smooth,
    estimate_lambda_max,
)
from topopt_in_petsc_tpu.solvers.multigrid import GeometricMultigrid

__all__ = [
    "pcg",
    "chebyshev_smooth",
    "estimate_lambda_max",
    "GeometricMultigrid",
]
