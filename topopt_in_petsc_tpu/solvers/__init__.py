from topopt_in_petsc_tpu.solvers.cg import CGResult, PCGState, pcg
from topopt_in_petsc_tpu.solvers.chebyshev import (
    chebyshev_smooth,
    estimate_lambda_max,
)
from topopt_in_petsc_tpu.solvers.multigrid import GeometricMultigrid

__all__ = [
    "CGResult",
    "PCGState",
    "pcg",
    "chebyshev_smooth",
    "estimate_lambda_max",
    "GeometricMultigrid",
]
