from topopt_in_petsc_tpu.opt.filters import DesignFilter
from topopt_in_petsc_tpu.opt.mma import MMA

__all__ = ["DesignFilter", "MMA"]
