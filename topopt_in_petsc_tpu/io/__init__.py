from topopt_in_petsc_tpu.io.vtu import write_vtu
from topopt_in_petsc_tpu.io.restart import RestartManager

__all__ = ["write_vtu", "RestartManager"]
