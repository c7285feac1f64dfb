"""Blocked-RESIDENT multigrid solver for the SPMD halo engine.

Round 2's single-chip win (ops/blocked_hex.py + solvers/blocked_mg.py:
solver vectors live in the Pallas kernel's layout across the whole
solve, no per-apply relayout) applied to the multi-chip path: each
shard keeps its LOCAL block's Krylov/smoother vectors in the blocked
layout, and the width-1 halo exchange (the overlapping-block
`halo_accumulate` of parallel/spmd.py) runs directly on blocked arrays
via boundary-plane strided slices (BlockedHexOperator.get_plane /
add_plane) + `lax.ppermute` — the per-matvec layout-conversion tax that
the per-apply kernels pay (measured 42% at 256^3) never occurs.

Layout conversions remain only at MG level hops (restrict/prolong ride
the existing nodal `restrict_spmd`/`prolong_spmd`) and at solve
entry/exit — exactly mirroring the single-chip blocked_mg design.

Reference parity: this is the distributed MatMult + PCMG application
(LinearElasticity.cc:204, 619-746) over the DMDA-style overlapping
decomposition (parallel/decomp.py).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from topopt_in_petsc_tpu.ops.blocked_hex import BlockedHexOperator
from topopt_in_petsc_tpu.ops.hex_operator import (
    hex_operator_absrowsum,
    hex_operator_diagonal,
)
from topopt_in_petsc_tpu.parallel.spmd import (
    AXIS_NAMES,
    _perm_to_higher,
    _perm_to_lower,
    halo_accumulate,
    pmax_scalar,
    prolong_spmd,
    restrict_spmd,
)
from topopt_in_petsc_tpu.solvers.cg import CGResult, pcg
from topopt_in_petsc_tpu.solvers.chebyshev import chebyshev_smooth
from topopt_in_petsc_tpu.solvers.multigrid import coarsen_cell_field


def halo_accumulate_blocked(
    vb: jax.Array, op: BlockedHexOperator, mesh_shape
) -> jax.Array:
    """Complete partial sums on shared planes, blocked layout in/out.

    Semantics identical to spmd.halo_accumulate on the nodal layout:
    per axis, both copies of a duplicated plane end up holding the
    total (exchange uses pre-update values; axis-sequenced so corner
    contributions compose transitively).  Plane tensors are canonical
    per axis, so ppermute between shards with identical local layouts
    lines up 1:1; junk in halo/pad lanes adds into junk on the other
    side and never touches owned positions."""
    for axis in range(3):
        m = mesh_shape[axis]
        if m == 1:
            continue
        name = AXIS_NAMES[axis]
        n_ax = op.nn[axis]
        lo = op.get_plane(vb, axis, 0)
        hi = op.get_plane(vb, axis, n_ax - 1)
        from_higher = lax.ppermute(lo, name, _perm_to_lower(m))
        from_lower = lax.ppermute(hi, name, _perm_to_higher(m))
        vb = op.add_plane(vb, axis, n_ax - 1, from_higher)
        vb = op.add_plane(vb, axis, 0, from_lower)
    return vb


class BlockedSpmdMG:
    """Per-shard resident-blocked MG-PCG; runs INSIDE shard_map.

    Construction is host-side (static local shapes from the
    decomposition); `setup`/`vcycle`/`solve` are traced per shard.
    `env` is the static per-level environment of
    spmd.SpmdMultigrid.build_static_env (local nodal mask / ownership
    weights), which `setup` augments with the blocked quantities."""

    def __init__(
        self,
        decomp,
        KEs: Sequence[np.ndarray],
        *,
        dof: int = 3,
        dtype=jnp.float32,
        smooth_sweeps: int = 4,
        cheby_lower: float = 0.06,
        cheby_upper: float = 1.1,
        coarse_rtol: float = 1e-8,
        coarse_maxit: int = 30,
        precise_dots: bool = True,
        mg_dtype=None,
        krylov_compress="auto",
        fine_post_smooth: int = 0,
        interpret: bool = False,
    ):
        self.mesh_shape = decomp.mesh_shape
        self.nlvls = decomp.nlvls
        self.dof = dof
        self.dtype = dtype
        self.KEs = [jnp.asarray(k, dtype) for k in KEs]
        # mg_dtype: storage dtype of the V-cycle (preconditioner only);
        # bf16 halves the smoother's HBM traffic and live set — the
        # 512^3-class lever, per LOCAL shard (solvers/blocked_mg.py has
        # the single-chip rationale, including the "mixed" mode: f32
        # fine level, bf16 coarse levels).  Outer Krylov always runs
        # f32.
        if mg_dtype == "mixed":
            self.level_dtypes = [jnp.float32] + [jnp.bfloat16] * (
                self.nlvls - 1
            )
        else:
            self.level_dtypes = [mg_dtype or jnp.float32] * self.nlvls
        self.mg_dtype = self.level_dtypes[0]
        self.ops: List[BlockedHexOperator] = [
            BlockedHexOperator(
                decomp.local_nn(l), np.asarray(KEs[l]), dof=dof,
                dtype=self.level_dtypes[l], interpret=interpret,
            )
            for l in range(self.nlvls)
        ]
        if self.level_dtypes[0] == jnp.float32:
            self.op32 = self.ops[0]
        else:  # separate f32 fine-level kernel for the outer Krylov
            self.op32 = BlockedHexOperator(
                decomp.local_nn(0), np.asarray(KEs[0]), dof=dof,
                dtype=jnp.float32, interpret=interpret,
            )
        if krylov_compress == "auto":
            krylov_compress = (
                jnp.bfloat16
                if any(d != jnp.float32 for d in self.level_dtypes)
                else None
            )
        self.krylov_compress = krylov_compress
        # f32 refinement after a reduced-precision V-cycle (no-op for
        # f32 V-cycles); see blocked_mg for the rationale
        self.fine_post_smooth = (
            fine_post_smooth if self.op32 is not self.ops[0] else 0
        )
        self.smooth_sweeps = smooth_sweeps
        self.cheby_lower = cheby_lower
        self.cheby_upper = cheby_upper
        self.coarse_rtol = coarse_rtol
        self.coarse_maxit = coarse_maxit
        self.precise = precise_dots

    # -- on-the-fly masks / weights / loads (ZERO stored fields) ------- #
    #
    # The single-chip blocked solver's decisive 512^3 memory lever —
    # Dirichlet masks, ownership weights and the cantilever load as
    # index predicates instead of stored nodal fields
    # (solvers/blocked_mg.py, LinearElasticity.cc:143-171 computes BCs
    # from coordinates too) — extended with the shard's mesh position
    # (lax.axis_index): nothing mask-shaped is ever resident per chip.

    def _wall_gate(self):
        """Traced bool: this shard holds the global x == 0 wall."""
        return lax.axis_index(AXIS_NAMES[0]) == 0

    def maskb(self, op: BlockedHexOperator, dtype=jnp.float32):
        """(rows, 1) Dirichlet mask factor in the blocked layout: 0 at
        the GLOBAL x == 0 node plane, 1 elsewhere (broadcasts over
        (dof, rows, Lcp)); iota-built, fused by XLA."""
        r = lax.broadcasted_iota(jnp.int32, (op.rows, 1), 0)
        wall = (r % np.int32(op.R) == 8) & self._wall_gate()
        return 1.0 - wall.astype(dtype)

    def shard_weight(self, op: BlockedHexOperator):
        """(rows, Lcp) 0/1 shard-duplication weights (low plane owned
        by the lower mesh neighbor) for dots, or None on a (1,1,1)
        mesh; iota-built."""
        x, y, z, _ = op.xyz_iota()
        w = None
        for a, coord in ((0, x), (1, y), (2, z)):
            if self.mesh_shape[a] == 1:
                continue
            dup = (coord == 0) & (lax.axis_index(AXIS_NAMES[a]) > 0)
            f = 1.0 - dup.astype(jnp.float32)
            w = f if w is None else w * f
        return w

    def local_rhs(self, dtype=jnp.float32) -> jax.Array:
        """Shard-local blocked cantilever RHS from index predicates +
        mesh position (BlockedHexOperator.cantilever_rhs's SPMD form):
        nonzero only on shards at the (x = last, z = 0) edge, corner
        halving at the GLOBAL y extremes; duplicated planes get
        identical (true) values."""
        op = self.op32
        mx, my, mz = self.mesh_shape
        gate = (lax.axis_index(AXIS_NAMES[0]) == mx - 1) & (
            lax.axis_index(AXIS_NAMES[2]) == 0
        )
        y_off = lax.axis_index(AXIS_NAMES[1]) * np.int32(op.nn[1] - 1)
        ny_global = my * (op.nn[1] - 1) + 1
        return op.cantilever_rhs(
            dtype=dtype, edge_gate=gate, y_offset=y_off,
            ny_global=ny_global,
        )

    # -- per-solve setup (traced, inside shard_map) -------------------- #

    def setup(self, scale_fine: jax.Array):
        """Per-level {eb, dinvb, lmax(, eb32)} from the fine SIMP
        scale.  Nodal stencil math identical to SpmdMultigrid.setup
        (rediscretized coarsening) with the Dirichlet treatment as an
        on-the-fly predicate; halo accumulation completes d/R across
        shards before the Gershgorin bound (pmax over the mesh)."""
        Es = [scale_fine.astype(self.dtype)]
        for l in range(1, self.nlvls):
            Es.append(coarsen_cell_field(Es[-1]))
        gate = self._wall_gate()
        out = []
        for l in range(self.nlvls):
            lvl = {}
            op = self.ops[l]
            coef = Es[l]
            nn = tuple(s + 1 for s in coef.shape)
            d = hex_operator_diagonal(coef, self.KEs[l], nn)
            R = hex_operator_absrowsum(coef, self.KEs[l], nn)
            d = halo_accumulate(d, self.mesh_shape)
            R = halo_accumulate(R, self.mesh_shape)
            ix0 = (
                lax.broadcasted_iota(
                    jnp.int32, (nn[0], 1, 1, 1), 0
                )
                == 0
            ) & gate
            d = jnp.where(ix0, 1.0, d)
            lvl["lmax"] = pmax_scalar(
                jnp.max(jnp.where(ix0, 1.0, R / d))
            )
            lvl["eb"] = op.prepare_coef(coef)
            lvl["dinvb"] = op.to_blocked(1.0 / d)
            if l == 0 and self.op32 is not self.ops[0]:
                lvl["eb32"] = self.op32.prepare_coef(coef)
            out.append(lvl)
        return out

    # -- blocked operator application ---------------------------------- #

    def apply(self, level: int, lvl, vb: jax.Array) -> jax.Array:
        """Masked distributed K@v on blocked arrays:
        N^T K N + (I - N) with halo accumulation."""
        op = self.ops[level]
        m = self.maskb(op, vb.dtype)
        Kv = op.matvec(op.refresh(m * vb), lvl["eb"])
        Kv = halo_accumulate_blocked(Kv, op, self.mesh_shape)
        return m * Kv + (1.0 - m) * vb

    def dot_fn(self, level: int):
        """Globally-correct inner product on blocked arrays: the
        single-chip chunked two-stage reduction (per-row f32 partials,
        f64 across partials — BlockedHexOperator.dot, same accuracy
        rationale as solvers/cg._dot) with the iota-built
        shard-duplication weights folded in via `w_extra`, then psum
        over the mesh."""
        op = self.ops[level]
        precise = self.precise

        def dot(a, b):
            s = op.dot(a, b, precise, w_extra=self.shard_weight(op))
            return lax.psum(s, AXIS_NAMES)

        return dot

    # -- V-cycle -------------------------------------------------------- #

    def vcycle(self, env, b: jax.Array, level: int = 0) -> jax.Array:
        lvl = env[level]
        op = self.ops[level]
        A = partial(self.apply, level, lvl)

        if level == self.nlvls - 1:
            res = pcg(
                A,
                b,
                jnp.zeros_like(b),
                M=lambda r: lvl["dinvb"] * r,
                rtol=self.coarse_rtol,
                maxiter=self.coarse_maxit,
                flexible=False,
                dot=self.dot_fn(level),
            )
            return res.x

        smooth = lambda bb, xx, **kw: chebyshev_smooth(
            A, bb, xx, lvl["dinvb"], lvl["lmax"],
            degree=self.smooth_sweeps,
            lower=self.cheby_lower, upper=self.cheby_upper, **kw,
        )
        x = smooth(b, b, x_is_zero=True)
        r = b - A(x)
        # level hop through the local nodal layout (restrict/prolong
        # ride the existing halo-aware SPMD transfer operators)
        opc = self.ops[level + 1]
        rc = restrict_spmd(op.from_blocked(r), self.mesh_shape)
        rcb = self.maskb(opc, opc.vdt) * opc.to_blocked(rc)
        ecb = self.vcycle(env, rcb, level + 1)
        e = prolong_spmd(opc.from_blocked(ecb))
        x = x + self.maskb(op, op.vdt) * op.to_blocked(e)
        x = smooth(b, x)
        return x

    # -- outer solve ----------------------------------------------------- #

    def _outer_ops(self, env):
        """(A, M) for the f32 outer Krylov from a `setup()` env (same
        split as blocked_mg._outer_ops: when the V-cycle stores bf16,
        the outer matvec runs a separate f32 fine kernel)."""
        lvl0 = env[0]
        if self.op32 is self.ops[0]:
            A = partial(self.apply, 0, lvl0)
            M = lambda r: self.vcycle(env, r)
        else:
            op32 = self.op32
            eb32 = lvl0["eb32"]
            mesh_shape = self.mesh_shape

            def A(v):
                m = self.maskb(op32, v.dtype)
                Kv = op32.matvec(op32.refresh(m * v), eb32)
                Kv = halo_accumulate_blocked(Kv, op32, mesh_shape)
                return m * Kv + (1.0 - m) * v

            mgdt = self.mg_dtype

            def M(r):
                z = self.vcycle(env, r.astype(mgdt))
                z = z.astype(r.dtype)
                if self.fine_post_smooth > 0:
                    # f32 refinement with the halo-correct f32 fine
                    # operator — same lever as blocked_mg._outer_ops
                    z = chebyshev_smooth(
                        A, r, z,
                        lvl0["dinvb"].astype(r.dtype),
                        lvl0["lmax"],
                        degree=self.fine_post_smooth,
                        lower=self.cheby_lower,
                        upper=self.cheby_upper,
                    )
                return z

        return A, M

    def _pcg_opts(self, ksp_type: str):
        compress = self.krylov_compress
        return dict(
            flexible=(ksp_type != "cg"),
            flex_compress=compress,
            p_compress=compress,
        )

    def solve(
        self,
        scale_fine: jax.Array,
        b: jax.Array | None,
        x0: jax.Array,
        *,
        rtol: float = 1e-5,
        maxiter: int = 200,
        ksp_type: str = "fcg",
    ):
        """Solve K u = b for LOCAL nodal b/x0 (consistent overlapping
        vectors); b=None uses the on-the-fly cantilever load
        (local_rhs — no nodal RHS exists anywhere).  Returns
        (u_local_nodal, iters, relres).  All inner work runs on
        resident blocked arrays."""
        env = self.setup(scale_fine)
        op32 = self.op32
        A, M = self._outer_ops(env)
        b_blk = (
            self.local_rhs(jnp.float32) if b is None
            else op32.to_blocked(b)
        )
        res = pcg(
            A,
            b_blk,
            op32.to_blocked(x0),
            M,
            rtol=rtol,
            maxiter=maxiter,
            dot=self.dot_fn(0),
            **self._pcg_opts(ksp_type),
        )
        return CGResult(
            x=op32.from_blocked(res.x, self.dtype),
            iters=res.iters,
            relres=res.relres,
        )

    # -- split solve for host-chunked outer loops ------------------------ #
    #
    # This backend kills single device executions beyond ~1-2 minutes;
    # a pod-scale local block pays the same per-iteration cost the
    # single chip does, so the SPMD solve must also be host-steppable.
    # Both functions run INSIDE shard_map; the caller unpeels/peels the
    # returned trees across the jit boundary (parallel/spmd_model.py).

    CARRY_KEYS = ("eb", "dinvb", "lmax", "eb32")

    def solve_init(
        self,
        scale_fine: jax.Array,
        b: jax.Array | None,
        x0: jax.Array,
        *,
        rtol,
        ksp_type: str = "fcg",
        x0_blocked: bool = False,
    ):
        """setup + initial residual/preconditioner application.  Returns
        (carry_env, PCGState): `carry_env` is the setup() env (masks/
        weights are iota-built per program, so only {eb, dinvb, lmax,
        eb32} cross the boundary), both trees ready to unpeel.  b=None
        uses the on-the-fly cantilever load.  x0_blocked=True: the warm
        start is already in the kernel layout (the chunked route keeps
        the state field blocked end-to-end, so the donation into this
        program aliases — no dead nodal buffer at the solve's peak)."""
        env = self.setup(scale_fine)
        op32 = self.op32
        A, M = self._outer_ops(env)
        b_blk = (
            self.local_rhs(jnp.float32) if b is None
            else op32.to_blocked(b)
        )
        _, st = pcg(
            A,
            b_blk,
            x0 if x0_blocked else op32.to_blocked(x0),
            M,
            rtol=rtol,
            maxiter=0,
            dot=self.dot_fn(0),
            return_state=True,
            **self._pcg_opts(ksp_type),
        )
        carry = [
            {k: lvl[k] for k in self.CARRY_KEYS if lvl.get(k) is not None}
            for lvl in env
        ]
        return carry, st

    def solve_step(self, carry, st, cap, rtol, *, ksp_type: str = "fcg"):
        """Advance the SAME Krylov solve to iteration `cap` (a traced
        i32).  `carry` is solve_init's env; `st` the PCGState."""
        env = [dict(lvl) for lvl in carry]
        A, M = self._outer_ops(env)
        _, st = pcg(
            A,
            None,
            None,
            M,
            rtol=rtol,
            maxiter=cap,
            dot=self.dot_fn(0),
            state0=st,
            return_state=True,
            **self._pcg_opts(ksp_type),
        )
        return st
