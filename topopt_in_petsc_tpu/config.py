"""Problem configuration mirroring the reference's PETSc options database.

The reference configures everything through ~25 PETSc CLI flags with defaults
set in TopOpt::SetUp (reference TopOpt.cc:106-135) and read in SetUpMESH /
SetUpOPT (TopOpt.cc:154-165, 323-337) plus the restart flags
(TopOpt.cc:408-450, LinearElasticity.cc:561-585).  This module provides a
typed dataclass with the same names and defaults, and a CLI parser accepting
the same single-dash flags for drop-in comparability.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


@dataclasses.dataclass
class TopOptConfig:
    """All knobs of the optimization problem + solvers.

    Field names/defaults follow the reference CLI one-to-one
    (TopOpt.cc:106-135):  ``-nx -ny -nz`` are *node* counts, the design grid
    is ``(nx-1, ny-1, nz-1)`` elements.
    """

    # --- FEM mesh (TopOpt.cc:106-117) ---
    nx: int = 65
    ny: int = 33
    nz: int = 33
    xcmin: float = 0.0
    xcmax: float = 2.0
    ycmin: float = 0.0
    ycmax: float = 1.0
    zcmin: float = 0.0
    zcmax: float = 1.0
    nu: float = 0.3
    nlvls: int = 4  # multigrid levels

    # --- Optimization (TopOpt.cc:119-128) ---
    volfrac: float = 0.12
    maxItr: int = 400
    rmin: float = 0.08
    penal: float = 3.0
    Emin: float = 1.0e-9
    Emax: float = 1.0
    filter: int = 1  # 0=sensitivity, 1=density, 2=PDE; other = no filtering
    Xmin: float = 0.0
    Xmax: float = 1.0
    movlim: float = 0.2
    nconstraints: int = 1  # m — reference TopOpt(nconstraints) (TopOpt.cc:15)

    # --- Projection filter (TopOpt.cc:131-135) ---
    projectionFilter: bool = False
    beta: float = 0.1
    betaFinal: float = 48.0
    eta: float = 0.0

    # --- Restart (TopOpt.cc:401-450) ---
    restart: bool = True
    onlyLoadDesign: bool = False
    restartFileVec: str = ""  # here: one .npz per checkpoint stream
    # parity NO-OP: the reference stores itr/fscale in a separate ASCII
    # sidecar (-restartFileItr, TopOpt.cc:552-554); here they live inside
    # the restart .npz, so the flag is accepted and ignored (README).
    restartFileItr: str = ""
    restartFileVecSol: str = ""
    workdir: str = "./"

    # --- Linear solver (LinearElasticity.cc:619-635; TPU-native choices) ---
    # Outer Krylov: the reference uses FGMRES(100); K is SPD after the
    # symmetric Dirichlet treatment (LinearElasticity.cc:530-538) so we use
    # flexible-PCG by default (tpu-friendly short recurrence).
    ksp_rtol: float = 1.0e-5
    ksp_maxit: int = 200
    # outer Krylov: "fcg" (flexible PCG, TPU default — K is SPD) or
    # "fgmres" (the reference's own method, LinearElasticity.cc:638-650;
    # robustness fallback, costs (2*restart+1) basis vectors of HBM)
    ksp_type: str = "fcg"
    ksp_gmres_restart: int = 30
    # chunked state solve: run the outer Krylov as a host loop over
    # N-iteration device programs (full Krylov state crosses the jit
    # boundary, so the trajectory is unchanged).  This backend kills
    # single device executions beyond ~1-2 min; at 512^3 (~0.8
    # s/iteration) the solve MUST be chunked.  -1 = auto (chunk of 32
    # when ndof >= 1e8), 0 = never, >0 = explicit chunk size.
    ksp_chunk: int = -1
    # PETSc's -ksp_monitor analogue: print per-chunk residual norms on
    # the chunked solve path (inside a single compiled solve the
    # residual history is not host-visible; the final iter/rerr line is
    # always printed by the driver).
    ksp_monitor: bool = False
    # giga-dof fused-iteration memory lever: park the design/optimizer
    # element fields (x, xTilde, L, U, xo1, xo2) and the filter
    # constants on the HOST while the state solve runs, restoring them
    # for the tail program — bit-exact (pure data movement, no
    # precision change), trading ~2x3 GB of PCIe/tunnel traffic per
    # iteration for ~4 GB of solve-phase HBM.  -1 = auto (on when the
    # solve is host-chunked AND local ndof >= 3.5e8, the size where the
    # full fused state exceeds one chip), 0 = never, 1 = always.
    park_design: int = -1
    # run the fused iteration's post-solve tail as TWO programs
    # (objective+filter-gradients, then MMA+project) instead of one —
    # a smaller-program fallback for giga-dof sizes and a peak-HBM
    # relief (the MMA dual solve never coexists with the quadform's
    # transients).  Trajectory-identical (same ops, one host hop).
    tail_split: bool = False
    # degree of an f32 Chebyshev refinement appended to a
    # reduced-precision (bf16) V-cycle, using the resident f32 fine
    # kernel — damps the bf16 rounding noise for ~1 f32 matvec per
    # degree with zero extra stored vectors.  0 = off.
    mg_fine_post: int = 0
    coarse_op: str = "rediscretize"  # or "galerkin_octant" (exact
    # level-1 Galerkin; comparable iteration counts, higher per-cycle cost)
    coarse_rtol: float = 1.0e-8
    coarse_maxit: int = 30
    smooth_sweeps: int = 4  # Chebyshev degree per pre/post smooth
    cheby_upper: float = 1.1  # smooth band = [lower*lmax, upper*lmax]
    # -1 = auto: 0.06 for the default degree-4 smoother; 0.25 when a
    # reduced-precision V-cycle runs degree <= 2 (the 512^3 recipe) —
    # a degree-2 polynomial cannot damp a [0.06, 1.1] band, and
    # narrowing it is a measured free win (110 -> 97 iterations,
    # 83.2 -> 73.4 s at 512^3; docs/PERFORMANCE.md round-5e).
    # (lmax from the certain Gershgorin bound.)
    cheby_lower: float = -1.0

    # --- PDE filter solver (PDEFilter.cc:269-380) ---
    pde_nlvls: int = 3
    pde_rtol: float = 1.0e-8
    pde_maxit: int = 60

    # --- TPU-native knobs (no reference equivalent) ---
    dtype: str = "float32"  # field dtype: "float32" | "float64"
    # fine-level K@u: "auto" (Pallas kernel on TPU, XLA elsewhere),
    # "xla", or "pallas"
    operator_impl: str = "auto"
    # V-cycle precision: "same" | "bfloat16" | "mixed" (f32 fine level,
    # bf16 coarse levels)
    mg_dtype: str = "same"
    # (pallas: fused VMEM kernel, experimental on this environment's
    # remote Mosaic compiler — see ops/pallas_hex.py)
    precise_dots: bool = True  # upcast CG/objective reductions to f64
    mesh_shape: tuple = (1, 1, 1)  # device mesh (x, y, z); product = #devices
    # run each optimization iteration as ONE compiled program (the SPMD
    # fused step on a 1-device mesh; automatic when mesh_shape != 1,1,1)
    fused: bool = False
    output_cadence_vtu: bool = True  # write .vtu fields like main.cc:114-116
    output_dat: bool = False  # also write the reference-format output_00000.dat
    profile_dir: str = ""  # capture a jax.profiler trace of the run

    # ----------------------------------------------------------------- #

    @property
    def m(self) -> int:
        return self.nconstraints

    @property
    def nelx(self) -> int:
        return self.nx - 1

    @property
    def nely(self) -> int:
        return self.ny - 1

    @property
    def nelz(self) -> int:
        return self.nz - 1

    @property
    def nelem(self) -> int:
        return self.nelx * self.nely * self.nelz

    @property
    def ndof(self) -> int:
        return 3 * self.nx * self.ny * self.nz

    # -- shared auto-lever rules (single-chip AND per-shard SPMD; the
    # thresholds are PER-CHIP constraints, so callers pass local dof) -- #

    def resolve_ksp_chunk(self, ndof: int) -> int:
        """Resolved -ksp_chunk for a given (local) dof count: >=0
        explicit, -1 auto — 32-iteration chunks at >= 1e8 dof (this
        backend kills device executions beyond ~1-2 minutes)."""
        if self.ksp_chunk >= 0:
            return self.ksp_chunk
        return 32 if ndof >= 1e8 else 0

    def resolve_mg_bf16(self, ndof: int) -> bool:
        """True when the resolved V-cycle storage is not pure f32."""
        return self.resolve_mg_mode(ndof) != "same"

    def resolve_park(self, ndof: int) -> bool:
        """Resolved -park_design for a given (local) dof count: the
        fused iteration's design/MMA/filter state (~4 GB at 512^3) on
        top of the solve's ~14.5 GB peak exceeds one chip's HBM — park
        it on the host during the solve phase."""
        if self.park_design >= 0:
            return bool(self.park_design)
        return ndof >= 3.5e8

    def resolve_cheby_lower(self, ndof: int) -> float:
        """Resolved smoother band lower bound (see the field comment):
        explicit value wins; auto narrows the band to 0.25 when the
        resolved V-cycle is reduced-precision AND the smoother degree
        is <= 2 (the giga-dof recipe)."""
        if self.cheby_lower >= 0:
            return self.cheby_lower
        if self.resolve_mg_mode(ndof) != "same" and \
                self.smooth_sweeps <= 2:
            return 0.25
        return 0.06

    def resolve_mg_mode(self, ndof: int) -> str:
        """Resolved V-cycle storage mode: "same" (f32), "bfloat16"
        (every level bf16), or "mixed" (f32 fine level, bf16 coarse
        levels).  Auto at >= 3.5e8 (local) dof the f32 V-cycle exceeds
        one chip's HBM (compile-checked at 512^3: f32 needs 16.2 GB >
        15.75 GB; bf16 fits at 14.5 GB) — the auto pick is "bfloat16",
        the proven-fit flagship recipe."""
        if self.mg_dtype != "same":
            return self.mg_dtype
        return "bfloat16" if ndof >= 3.5e8 else "same"

    @property
    def dx(self) -> float:
        return (self.xcmax - self.xcmin) / (self.nx - 1)

    @property
    def dy(self) -> float:
        return (self.ycmax - self.ycmin) / (self.ny - 1)

    @property
    def dz(self) -> float:
        return (self.zcmax - self.zcmin) / (self.nz - 1)

    @property
    def jnp_dtype(self):
        return jnp.float64 if self.dtype == "float64" else jnp.float32

    def validate(self) -> None:
        """MG-compatibility check (reference TopOpt.cc:183-201).

        Every axis must satisfy (n-1) % 2^(nlvls-1) == 0 so the element grid
        can be halved nlvls-1 times.  The reference exit(0)s; we raise.
        """
        div = 2 ** (self.nlvls - 1)
        for name, n in (("x", self.nx), ("y", self.ny), ("z", self.nz)):
            if (n - 1) % div != 0:
                raise ValueError(
                    "MESH DIMENSION NOT COMPATIBLE WITH NUMBER OF MULTIGRID "
                    f"LEVELS: {name} - number of nodes {n} cannot be halved "
                    f"{self.nlvls - 1} times"
                )
        if self.filter == 0 and self.Xmin < 0.001:
            # Prevent division by zero in the sensitivity filter
            # (reference TopOpt.cc:357-359).
            self.Xmin = 0.001
        if self.ksp_type not in ("fcg", "fgmres"):
            raise ValueError(
                f"-ksp_type must be 'fcg' or 'fgmres', got {self.ksp_type}"
            )
        if self.mg_dtype not in ("same", "bfloat16", "mixed"):
            raise ValueError(
                f"-mg_dtype must be 'same', 'bfloat16' or 'mixed', "
                f"got {self.mg_dtype}"
            )

    # ----------------------------------------------------------------- #
    # CLI (PETSc options style: single-dash long flags; TopOpt.cc:154-165)

    _INT_FLAGS = ("nx", "ny", "nz", "nlvls", "maxItr", "filter", "nconstraints",
                  "ksp_maxit", "smooth_sweeps", "pde_nlvls", "pde_maxit",
                  "coarse_maxit", "ksp_gmres_restart", "ksp_chunk",
                  "park_design", "mg_fine_post")
    _BOOL_FLAGS = ("projectionFilter", "restart", "onlyLoadDesign",
                   "fused", "ksp_monitor", "tail_split",
                   "precise_dots", "output_cadence_vtu", "output_dat")
    _STR_FLAGS = ("restartFileVec", "restartFileItr", "restartFileVecSol",
                  "workdir", "dtype", "coarse_op", "operator_impl",
                  "mg_dtype", "profile_dir", "ksp_type")

    @classmethod
    def from_args(cls, argv: Sequence[str]) -> "TopOptConfig":
        cfg = cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        i = 0
        argv = list(argv)
        while i < len(argv):
            tok = argv[i]
            if not tok.startswith("-"):
                raise ValueError(f"unexpected argument: {tok}")
            name = tok.lstrip("-")
            if name not in fields:
                raise ValueError(f"unknown option: {tok}")
            if i + 1 >= len(argv):
                raise ValueError(f"option {tok} needs a value")
            val = argv[i + 1]
            if name in cls._INT_FLAGS:
                setattr(cfg, name, int(val))
            elif name in cls._BOOL_FLAGS:
                setattr(cfg, name, val.lower() in ("1", "true", "yes", "on"))
            elif name in cls._STR_FLAGS:
                setattr(cfg, name, val)
            elif name == "mesh_shape":
                setattr(cfg, name, tuple(int(v) for v in val.split(",")))
            else:
                setattr(cfg, name, float(val))
            i += 2
        cfg.validate()
        return cfg

    def banner(self) -> str:
        """Config printout equivalent to TopOpt.cc:168-180, 339-353."""
        lines = [
            "#" * 62,
            "######################### FEM settings #######################",
            f"# Number of nodes: (-nx,-ny,-nz):        ({self.nx},{self.ny},{self.nz})",
            f"# Number of degree of freedom:           {self.ndof}",
            f"# Number of elements:                    ({self.nelx},{self.nely},{self.nelz})",
            f"# Dimensions: (-xcmin,-xcmax,..,-zcmax): ({self.xcmax - self.xcmin},{self.ycmax - self.ycmin},{self.zcmax - self.zcmin})",
            f"# -nlvls: {self.nlvls}",
            "################### Optimization settings ####################",
            f"# Problem size: n= {self.nelem}, m= {self.m}",
            f"# -filter: {self.filter}  (0=sens., 1=dens, 2=PDE)",
            f"# -rmin: {self.rmin}",
            f"# -projectionFilter: {int(self.projectionFilter)}  (0/1)",
            f"# -beta: {self.beta}",
            f"# -betaFinal: {self.betaFinal}",
            f"# -eta: {self.eta}",
            f"# -volfrac: {self.volfrac}",
            f"# -penal: {self.penal}",
            f"# -Emin/-Emax: {self.Emin:e} - {self.Emax:e}",
            f"# -nu: {self.nu}",
            f"# -maxItr: {self.maxItr}",
            f"# -movlim: {self.movlim}",
            "#" * 62,
        ]
        return "\n".join(lines)
