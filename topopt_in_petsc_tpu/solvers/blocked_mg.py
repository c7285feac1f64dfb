"""MG-PCG state solver with ALL vectors resident in the blocked Pallas
layout (ops/blocked_hex.py).

The V-cycle smoothing sweeps dominate solve time (~10 fine-level
matvecs per outer FCG iteration); round 1 paid the kernel's layout
conversion on every one (42% of each matvec at 256^3).  Here Chebyshev
smoothing, residuals, the coarse CG, and the outer Krylov loop all
operate on resident blocked arrays at EVERY level; nodal layout appears
only in per-solve setup (diagonal/Gershgorin stencils), at restriction/
prolongation hops between levels (2 conversions per level per V-cycle
instead of ~10), and at solve entry/exit.

Matches the solver semantics of models/elasticity + solvers/multigrid
(same smoothers, same rediscretized coarsening, same Gershgorin bound,
same tolerances — reference LinearElasticity.cc:619-746), specialized
to the cantilever's x = 0 clamped wall so Dirichlet masks are row
predicates instead of stored (nx,ny,nz,3) fields (the 512^3 memory
lever; reference computes BCs from coordinates at setup too,
LinearElasticity.cc:143-171).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from topopt_in_petsc_tpu.ops.blocked_hex import BlockedHexOperator
from topopt_in_petsc_tpu.ops.hex_operator import (
    hex_operator_absrowsum,
    hex_operator_diagonal,
)
from topopt_in_petsc_tpu.solvers.cg import CGResult, pcg
from topopt_in_petsc_tpu.solvers.chebyshev import chebyshev_smooth
from topopt_in_petsc_tpu.solvers.multigrid import (
    coarsen_cell_field,
    prolong,
    restrict,
)


class BlockedElasticityMG:
    """Resident-layout geometric-MG PCG for the cantilever problem."""

    def __init__(
        self,
        grids: Sequence,
        KEs: Sequence[np.ndarray],
        *,
        smooth_sweeps: int = 4,
        cheby_lower: float = 0.06,
        cheby_upper: float = 1.1,
        coarse_rtol: float = 1e-8,
        coarse_maxit: int = 30,
        precise_dots: bool = True,
        mg_dtype=None,
        krylov_compress="auto",
        fine_post_smooth: int = 0,
        lane_cap: int | None = None,
        interpret: bool = False,
    ):
        self.grids = tuple(grids)
        self.nlvls = len(self.grids)
        self.KEs = [jnp.asarray(k, jnp.float32) for k in KEs]
        kw = {} if lane_cap is None else {"lane_cap": lane_cap}
        # mg_dtype: storage dtype of the V-CYCLE (preconditioner only).
        # bf16 halves both the smoother's HBM traffic and the live-set
        # footprint — the lever that fits 512^3 (405M dof) on one chip;
        # the outer Krylov always runs f32 (true residual accuracy).
        # "mixed": f32 fine-level smoothing, bf16 on every coarse level
        # — the fine smoother sets MG convergence quality (bf16 storage
        # there costs ~2x outer iterations at high SIMP contrast) while
        # the coarse levels hold <1/7 of the hierarchy's values, so
        # their bf16 rounding is nearly free.
        if mg_dtype == "mixed":
            self.level_dtypes = [jnp.float32] + [jnp.bfloat16] * (
                self.nlvls - 1
            )
        else:
            self.level_dtypes = [mg_dtype or jnp.float32] * self.nlvls
        self.mg_dtype = self.level_dtypes[0]
        self.ops: List[BlockedHexOperator] = [
            BlockedHexOperator(
                g.nn, np.asarray(KEs[l]), dof=3,
                dtype=self.level_dtypes[l],
                interpret=interpret, **kw,
            )
            for l, g in enumerate(self.grids)
        ]
        if self.level_dtypes[0] == jnp.float32:
            self.op32 = self.ops[0]
        else:  # separate f32 fine-level kernel for the outer Krylov
            self.op32 = BlockedHexOperator(
                self.grids[0].nn, np.asarray(KEs[0]), dof=3,
                dtype=jnp.float32, interpret=interpret, **kw,
            )
        # krylov_compress: dtype for the carried search direction and
        # the flexible beta's kept Ap copy (see pcg docstring); "auto"
        # ties it to the V-cycle dtype, None disables.  Decoupled so an
        # f32 V-cycle can still shed ~2 full vectors at 512^3.
        if krylov_compress == "auto":
            krylov_compress = (
                jnp.bfloat16
                if any(d != jnp.float32 for d in self.level_dtypes)
                else None
            )
        self.krylov_compress = krylov_compress
        # degree of the f32 post-refinement smooth appended to a
        # reduced-precision V-cycle (no-op when the V-cycle is f32 or
        # when 0); see _outer_ops
        self.fine_post_smooth = (
            fine_post_smooth if self.op32 is not self.ops[0] else 0
        )
        self.smooth_sweeps = smooth_sweeps
        self.cheby_lower = cheby_lower
        self.cheby_upper = cheby_upper
        self.coarse_rtol = coarse_rtol
        self.coarse_maxit = coarse_maxit
        self.precise = precise_dots

    # -- per-solve setup (traced) -------------------------------------- #

    def setup(self, E_fine: jax.Array) -> List[dict]:
        """Per-level {eb, dinv, lmax} from the fine SIMP scale.  Masks
        and the Gershgorin bound use the on-the-fly x==0 predicate; the
        diagonal/abs-rowsum are gather-free nodal stencils."""
        levels = []
        E = E_fine.astype(jnp.float32)
        for l, g in enumerate(self.grids):
            if l > 0:
                E = coarsen_cell_field(E)
            nn = g.nn
            d = hex_operator_diagonal(E, self.KEs[l], nn)
            R = hex_operator_absrowsum(E, self.KEs[l], nn)
            ix0 = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (nn[0], 1, 1, 1), 0
                )
                == 0
            )
            d = jnp.where(ix0, 1.0, d)
            lmax = jnp.max(jnp.where(ix0, 1.0, R / d))
            lvl = {
                "eb": self.ops[l].prepare_coef(E),
                "dinv": self.ops[l].to_blocked(1.0 / d),
                "lmax": lmax,
            }
            if l == 0 and self.op32 is not self.ops[0]:
                lvl["eb32"] = self.op32.prepare_coef(E)
            levels.append(lvl)
        return levels

    def _A(self, l: int, eb):
        op = self.ops[l]
        return lambda v: op.mask0(op.matvec(op.refresh(v), eb))

    def _dot(self, l: int):
        op = self.ops[l]
        return lambda a, b: op.dot(a, b, self.precise)

    # -- V-cycle -------------------------------------------------------- #

    def vcycle(self, levels: List[dict], b: jax.Array,
               l: int = 0) -> jax.Array:
        lvl = levels[l]
        op = self.ops[l]
        A = self._A(l, lvl["eb"])

        if l == self.nlvls - 1:
            res = pcg(
                A,
                b,
                jnp.zeros_like(b),
                M=lambda r: lvl["dinv"] * r,
                rtol=self.coarse_rtol,
                maxiter=self.coarse_maxit,
                flexible=False,
                dot=self._dot(l),
            )
            return res.x

        smooth = lambda bb, xx, **kw: chebyshev_smooth(
            A, bb, xx, lvl["dinv"], lvl["lmax"],
            degree=self.smooth_sweeps,
            lower=self.cheby_lower, upper=self.cheby_upper, **kw,
        )

        # presmooth from zero: skip the A(0) kernel application (opaque
        # to XLA — it would really run) and its live buffer
        x = smooth(b, b, x_is_zero=True)
        r = b - A(x)
        # level hop through nodal layout (2 conversions per level)
        opc = self.ops[l + 1]
        rc = opc.mask0(opc.to_blocked(restrict(op.from_blocked(r))))
        ec = self.vcycle(levels, rc, l + 1)
        x = x + op.mask0(op.to_blocked(prolong(opc.from_blocked(ec))))
        x = smooth(b, x)
        return x

    # -- outer solve ----------------------------------------------------- #

    def _outer_ops(self, levels):
        """(A, M) for the outer Krylov from a `setup()` pytree."""
        op32 = self.op32
        if op32 is self.ops[0]:
            A = self._A(0, levels[0]["eb"])
            M = lambda r: self.vcycle(levels, r)
        else:
            eb32 = levels[0]["eb32"]
            A = lambda v: op32.mask0(
                op32.matvec(op32.refresh(v), eb32)
            )
            mgdt = self.mg_dtype

            def M(r):
                z = self.vcycle(levels, r.astype(mgdt))
                z = z.astype(r.dtype)
                if self.fine_post_smooth > 0:
                    # f32 refinement of the bf16 V-cycle output using
                    # the RESIDENT f32 fine kernel (op32/eb32, already
                    # in the carry for the outer matvec): bf16 rounding
                    # noise in z is spectrally flat, and its
                    # high-frequency part is exactly what a short f32
                    # Chebyshev-Jacobi step damps — iteration-parity
                    # recovery for ~1 extra f32 matvec per degree,
                    # zero extra STORED vectors (transients only).
                    # Appending an unsymmetric step is fine under the
                    # flexible outer (fcg, the default at this size).
                    z = chebyshev_smooth(
                        A, r, z,
                        levels[0]["dinv"].astype(r.dtype),
                        levels[0]["lmax"],
                        degree=self.fine_post_smooth,
                        lower=self.cheby_lower,
                        upper=self.cheby_upper,
                    )
                return z

        return A, M

    def solve(
        self,
        E_fine: jax.Array,
        b_blk: jax.Array,
        x0_blk: jax.Array,
        *,
        rtol: float = 1e-5,
        maxiter: int = 200,
        ksp_type: str = "fcg",
        gmres_restart: int = 30,
    ) -> CGResult:
        """Solve K(E) u = b in the resident layout (b, x0, and the
        returned solution are blocked arrays)."""
        levels = self.setup(E_fine)
        op32 = self.op32
        A, M = self._outer_ops(levels)

        if ksp_type == "fgmres":
            from topopt_in_petsc_tpu.solvers.gmres import fgmres

            return fgmres(
                A, b_blk, x0_blk, M, rtol=rtol, maxiter=maxiter,
                restart=gmres_restart,
                dot=lambda a, b: op32.dot(a, b, self.precise),
            )
        dot = lambda a, b: op32.dot(a, b, self.precise)
        # "fcg" (default): Polak-Ribiere flexible CG.  "cg": standard
        # PCG — one fewer live vector across the preconditioner, part of
        # the 512^3 memory budget.
        return pcg(
            A, b_blk, x0_blk, M, rtol=rtol, maxiter=maxiter,
            flexible=(ksp_type != "cg"), dot=dot,
            **self._pcg_opts(ksp_type),
        )

    # -- chunked outer solve (host-stepped device executions) ----------- #

    def _pcg_opts(self, ksp_type):
        compress = self.krylov_compress
        return dict(
            flex_compress=compress,
            p_compress=compress,
        )

    def _chunk_jits(self, ksp_type: str, coef_fn=None):
        """Jitted (init, step) pair for `solve_chunked`, cached per
        instance+ksp_type(+coefficient map)."""
        cache = getattr(self, "_cjit_cache", None)
        if cache is None:
            cache = self._cjit_cache = {}
        key = (ksp_type, coef_fn)
        if key in cache:
            return cache[key]
        opts = dict(
            flexible=(ksp_type != "cg"), **self._pcg_opts(ksp_type)
        )
        dot = lambda a, b: self.op32.dot(a, b, self.precise)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def init(E_fine, b_blk, x0_blk, rtol):
            # coef_fn (e.g. the SIMP map) and a None rhs are applied /
            # built INSIDE this program: E and the cantilever load are
            # then transients of the init execution instead of two
            # standalone arrays (0.54 + 1.62 GB at 512^3) pinned across
            # the program handoff — the margin that OOMed the fused
            # iteration's solve leg next to its xPhys field.
            if coef_fn is not None:
                E_fine = coef_fn(E_fine)
            if b_blk is None:
                b_blk = self.op32.cantilever_rhs()
            levels = self.setup(E_fine)
            A, M = self._outer_ops(levels)
            # maxiter=0: run setup + the initial residual/preconditioner
            # application only, return the full Krylov state
            _, st = pcg(
                A, b_blk, x0_blk, M, rtol=rtol, maxiter=0,
                dot=dot, return_state=True, **opts,
            )
            return levels, st

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(levels, st, cap, rtol):
            A, M = self._outer_ops(levels)
            _, st = pcg(
                A, None, None, M, rtol=rtol, maxiter=cap,
                dot=dot, state0=st, return_state=True, **opts,
            )
            return st

        cache[key] = (init, step)
        return init, step

    def solve_chunked(
        self,
        E_fine: jax.Array,
        b_blk: jax.Array,
        x0_blk: jax.Array,
        *,
        rtol: float = 1e-5,
        maxiter: int = 200,
        chunk: int = 32,
        ksp_type: str = "fcg",
        callback=None,
        coef_fn=None,
    ) -> CGResult:
        """Same Krylov trajectory as `solve`, executed as a host loop
        over `chunk`-iteration device programs.

        `coef_fn` maps the first argument to the element scale INSIDE
        the init program (pass xPhys + the SIMP map instead of a
        materialized E); `b_blk=None` builds the cantilever load inside
        the init program likewise — both keep giga-dof HBM margins.

        This backend kills single device executions beyond ~1-2 minutes
        (hardware-bisected: 513^3 x 40 iterations = 31 s runs; the same
        program with maxiter=200 crashes the TPU worker) — at ~0.8
        s/iteration for 512^3 the full solve MUST cross the host.  The
        full Krylov state (solvers/cg.PCGState) carries across calls, so
        convergence is identical to the single-program solve; buffers
        are donated, so no extra HBM is held between chunks.

        `callback(k, relres)` runs after every chunk (monitoring —
        PETSc's KSPMonitor analogue).
        """
        if ksp_type == "fgmres":
            raise ValueError(
                "solve_chunked supports fcg/cg (fgmres restarts are "
                "their own natural chunks; use solve())"
            )
        init, stepf = self._chunk_jits(ksp_type, coef_fn)
        rtol_a = jnp.asarray(rtol, jnp.float32)
        levels, st = init(E_fine, b_blk, x0_blk, rtol_a)
        # drop the python refs: b is dead after the initial residual and
        # x0 was donated — at 512^3 each held ref is 1.7 GiB of HBM
        b_blk = x0_blk = E_fine = None
        bnorm = float(st.bnorm)
        tol = max(rtol * bnorm, 1e-50)
        while float(st.rnorm) > tol and int(st.k) < maxiter:
            cap = jnp.asarray(min(int(st.k) + chunk, maxiter), jnp.int32)
            st = stepf(levels, st, cap, rtol_a)
            if callback is not None:
                callback(int(st.k), float(st.rnorm) / max(bnorm, 1e-300))
        return CGResult(
            x=st.x,
            iters=st.k,
            relres=st.rnorm / jnp.maximum(st.bnorm, 1e-300),
        )
