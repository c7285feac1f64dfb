"""SPMD elasticity solve + fully-fused SPMD optimization step.

Wraps the halo engine (parallel.spmd) into user-facing entry points that
take *blocked* global arrays (leading device axes, see parallel.decomp)
and run the whole computation inside one `shard_map` region over the
('x','y','z') mesh:

  - `SpmdElasticity`: state solve + objective/constraints/sensitivities
    (the reference's ComputeObjectiveConstraintsSensitivities,
    LinearElasticity.cc:363-445, distributed),
  - `make_spmd_fused_step`: physics + density filter + MMA in a single
    SPMD program (one optimization iteration of main.cc:54-123).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from topopt_in_petsc_tpu.config import TopOptConfig
from topopt_in_petsc_tpu.grid import Grid
from topopt_in_petsc_tpu.models.elasticity import build_cantilever_bc
from topopt_in_petsc_tpu.models.elements import hex8_stiffness
from topopt_in_petsc_tpu.ops.hex_operator import element_quadratic_form
from topopt_in_petsc_tpu.opt.filters import (
    build_filter_kernel,
    filter_stencil_halfwidth,
)
from topopt_in_petsc_tpu.opt.mma import MMA
from topopt_in_petsc_tpu.parallel.decomp import BlockDecomp
from topopt_in_petsc_tpu.parallel.mesh import make_device_mesh
from topopt_in_petsc_tpu.parallel.spmd import (
    AXIS_NAMES,
    SpmdMultigrid,
    ghost_fill_elem,
    halo_accumulate,
    make_psum_dot,
    peel,
    pmax_scalar,
    psum_scalar,
    unpeel,
)
from topopt_in_petsc_tpu.solvers.cg import pcg

BLK = P(*AXIS_NAMES)  # blocked arrays: leading device axes split
REP = P()  # replicated scalars/vectors


def _spec_like(tree, spec):
    return jax.tree_util.tree_map(lambda _: spec, tree)


class SpmdElasticity:
    """Distributed cantilever elasticity on an (mx,my,mz) device mesh."""

    def __init__(self, cfg: TopOptConfig, mesh: Mesh | None = None):
        cfg.validate()
        self.cfg = cfg
        self.grid = Grid.from_config(cfg)
        self.mesh_shape = tuple(cfg.mesh_shape)
        self.mesh = mesh or make_device_mesh(self.mesh_shape)
        self.decomp = BlockDecomp(self.grid, self.mesh_shape, cfg.nlvls)
        self.dtype = cfg.jnp_dtype
        np_dt = np.float64 if cfg.dtype == "float64" else np.float32

        grids = self.grid.hierarchy(cfg.nlvls)
        KEs = [hex8_stiffness(*g.h, cfg.nu) for g in grids]
        # fine-level LOCAL operator: Pallas kernel on TPU ("auto"),
        # built for the per-device block shape (the halo engine's local
        # apply is the same free-BC hex operator the kernel computes;
        # halo_accumulate completes it across blocks)
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = cfg.operator_impl
        if impl == "auto":
            impl = "blocked" if on_tpu else "xla"
        if impl == "blocked" and (
            cfg.dtype != "float32" or cfg.ksp_type == "fgmres"
        ):
            # the blocked kernel stack is f32 fcg/cg; fall back to the
            # nodal operators for f64 or FGMRES configurations — loudly,
            # so `-operator_impl blocked -ksp_type fgmres` is visibly a
            # different engine than requested
            reason = (
                f"ksp_type={cfg.ksp_type}"
                if cfg.ksp_type == "fgmres"
                else f"dtype={cfg.dtype}"
            )
            impl = "pallas" if on_tpu else "xla"
            print(
                f"# operator_impl '{cfg.operator_impl}': blocked-resident"
                f" solver does not support {reason}; using '{impl}'"
            )
        fine_apply = None
        level_applies = None
        self._pallas_quadform = None
        self._bspmd = None
        # per-shard size drives the 512^3-class auto levers (HBM and
        # the ~1-2 min execution kill are PER-CHIP constraints)
        local_ndof = 3 * int(np.prod(self.decomp.local_nn(0)))
        if impl == "blocked":
            from topopt_in_petsc_tpu.parallel.blocked_spmd import (
                BlockedSpmdMG,
            )

            # per-shard RESIDENT blocked solver: vectors stay in the
            # kernel layout across the whole local solve, halos ride
            # blocked boundary planes (parallel/blocked_spmd.py) — no
            # per-apply relayout (the pallas path's 42%/matvec tax)
            self._bspmd = BlockedSpmdMG(
                self.decomp,
                KEs,
                dof=3,
                smooth_sweeps=cfg.smooth_sweeps,
                cheby_lower=cfg.resolve_cheby_lower(local_ndof),
                cheby_upper=cfg.cheby_upper,
                coarse_rtol=cfg.coarse_rtol,
                coarse_maxit=cfg.coarse_maxit,
                precise_dots=cfg.precise_dots,
                mg_dtype={
                    "same": None,
                    "bfloat16": jnp.bfloat16,
                    "mixed": "mixed",
                }[cfg.resolve_mg_mode(local_ndof)],
                fine_post_smooth=cfg.mg_fine_post,
                interpret=not on_tpu,
            )
            if on_tpu:
                from topopt_in_petsc_tpu.ops.pallas_hex import (
                    make_pallas_quadform,
                )

                self._pallas_quadform = make_pallas_quadform(
                    self.decomp.local_nn(0), KEs[0]
                )
        if impl == "pallas":
            from topopt_in_petsc_tpu.ops.pallas_hex import (
                make_pallas_hex_apply,
                make_pallas_quadform,
            )

            fine_apply = make_pallas_hex_apply(
                self.decomp.local_nn(0), KEs[0]
            )
            # same size-gated rule as the single-device path: coarse
            # kernels win at <=129^3 local fine grids, lose above
            coarse_kernels = min(self.decomp.local_nn(0)) <= 129
            level_applies = [fine_apply] + [
                make_pallas_hex_apply(self.decomp.local_nn(l), KEs[l])
                if coarse_kernels
                and cfg.coarse_op != "galerkin_octant"
                and min(self.decomp.local_nn(l)) >= 17
                else None
                for l in range(1, self.decomp.nlvls)
            ]
            self._pallas_quadform = make_pallas_quadform(
                self.decomp.local_nn(0), KEs[0]
            )
        self.mg = SpmdMultigrid(
            self.decomp,
            KEs,
            dof=3,
            dtype=self.dtype,
            smooth_sweeps=cfg.smooth_sweeps,
            cheby_lower=cfg.resolve_cheby_lower(local_ndof),
            cheby_upper=cfg.cheby_upper,
            coarse_rtol=cfg.coarse_rtol,
            coarse_maxit=cfg.coarse_maxit,
            precise_dots=cfg.precise_dots,
            coarse_op=cfg.coarse_op,
            level_applies=level_applies,
        )

        if self._bspmd is not None:
            # blocked engine: Dirichlet masks, ownership weights and
            # the cantilever load are iota-built inside the programs
            # (BlockedSpmdMG.maskb/shard_weight/local_rhs) — no nodal
            # mask/weight/RHS fields exist on device OR host, the
            # decisive per-chip memory lever at 512^3-class shards.
            # rhs_blk is a (mx,my,mz,1,1,1,1) placeholder so program
            # signatures stay uniform across engines.
            mx, my, mz = self.mesh_shape
            self.rhs_blk = self._put_blk(
                np.zeros((mx, my, mz, 1, 1, 1, 1), np_dt)
            )
            self.env_blk = [{} for _ in range(cfg.nlvls)]
        else:
            N_np, RHS_np = build_cantilever_bc(self.grid, dtype=np_dt)
            masks = []
            mcur = N_np
            for l in range(cfg.nlvls):
                masks.append(mcur)
                mcur = mcur[::2, ::2, ::2]
            env_np = self.mg.build_static_env(masks)
            self.rhs_blk = self._put_blk(
                self.decomp.to_blocked_nodal(RHS_np).astype(np_dt)
            )
            self.env_blk = jax.tree_util.tree_map(
                self._put_blk, env_np
            )
        self.KE_fine = jnp.asarray(KEs[0], self.dtype)

        # identity u-layout converters; the chunked fused step installs
        # real kernel<->nodal shard_map programs (make_spmd_fused_step)
        self.u_to_nodal_blk = lambda u: u
        self.u_from_nodal_blk = lambda u: u

        self._solve_sm = self._build_solve()

    def _put_blk(self, arr):
        # pod-safe: make_array_from_callback places only this process's
        # addressable blocks (device_put of a host-global array fails
        # on multi-host where shards are non-addressable)
        from topopt_in_petsc_tpu.parallel.podio import put_blocked

        return put_blocked(arr, NamedSharding(self.mesh, BLK))

    # -- blocked-layout helpers (host side) ---------------------------- #

    def blocked_elem(self, arr):
        return self._put_blk(
            self.decomp.to_blocked_elem(np.asarray(arr))
        )

    def blocked_nodal(self, arr):
        return self._put_blk(
            self.decomp.to_blocked_nodal(np.asarray(arr))
        )

    def _zeros_blk(self, shape, dtype):
        # DEVICE-side zeros: a host np.zeros + put_blocked would ship
        # the full field over the (slow) host->device link — 1.7 GiB
        # per 512^3 warm start; a jitted constant costs nothing
        return jax.jit(
            lambda: jnp.zeros(shape, dtype),
            out_shardings=NamedSharding(self.mesh, BLK),
        )()

    def zeros_nodal_blk(self):
        mx, my, mz = self.mesh_shape
        nxl, nyl, nzl = self.decomp.local_nn(0)
        return self._zeros_blk(
            (mx, my, mz, nxl, nyl, nzl, 3),
            jnp.float64 if self.cfg.dtype == "float64"
            else jnp.float32,
        )

    def zeros_kernel_blk(self):
        """Zero state field in the per-shard KERNEL layout (the chunked
        route keeps u blocked end-to-end; models/elasticity uses the
        same trick single-chip)."""
        mx, my, mz = self.mesh_shape
        op32 = self._bspmd.op32
        return self._zeros_blk(
            (mx, my, mz, 3, op32.rows, op32.Lcp), jnp.float32
        )

    def simp(self, x):
        cfg = self.cfg
        return cfg.Emin + x**cfg.penal * (cfg.Emax - cfg.Emin)

    # -- the shard_mapped physics step --------------------------------- #

    def _physics_local(self, x, u0, rhs, env):
        """Runs INSIDE shard_map on local blocks."""
        cfg = self.cfg
        E = self.simp(x.astype(self.dtype))
        if self._bspmd is not None:
            # resident-blocked local solve (parallel/blocked_spmd.py);
            # b=None: the cantilever load is an on-the-fly predicate
            res = self._bspmd.solve(
                E, None, u0,
                rtol=cfg.ksp_rtol, maxiter=cfg.ksp_maxit,
                ksp_type=cfg.ksp_type,
            )
            u = res.x
        else:
            env = self.mg.setup(env, E)
            A = partial(self.mg.apply, 0, env)
            M = lambda r: self.mg.vcycle(env, r)
            dot = make_psum_dot(env[0]["w"], self.cfg.precise_dots)
            res = pcg(
                A, rhs, u0, M,
                rtol=cfg.ksp_rtol, maxiter=cfg.ksp_maxit,
                flexible=True, dot=dot,
            )
            u = res.x
        return (u, res.iters, res.relres) + self._objective_local(x, u, E)

    def _objective_local(self, x, u, E=None):
        """objective / constraints / sensitivities from a solved state
        (the tail of ComputeObjectiveConstraintsSensitivities,
        LinearElasticity.cc:363-445); INSIDE shard_map."""
        cfg = self.cfg
        if E is None:
            E = self.simp(x.astype(self.dtype))
        if self._pallas_quadform is not None:
            uKu = self._pallas_quadform(u)
        else:
            uKu = element_quadratic_form(u, self.KE_fine)
        acc = jnp.float64 if cfg.precise_dots else self.dtype
        fx = psum_scalar(jnp.sum(E * uKu, dtype=acc)).astype(self.dtype)
        nelem = self.grid.nelem
        vol = psum_scalar(jnp.sum(x, dtype=acc)) / nelem
        gx0 = (vol - cfg.volfrac).astype(self.dtype)
        dfdx = (
            -cfg.penal * x ** (cfg.penal - 1.0) * (cfg.Emax - cfg.Emin)
        ) * uKu
        gx = jnp.concatenate(
            [gx0[None], jnp.zeros((cfg.m - 1,), self.dtype)]
        )
        dgdx = jnp.full((cfg.m, *x.shape), 1.0 / nelem, self.dtype)
        return fx, gx, dfdx, dgdx

    def _build_solve(self):
        env_spec = _spec_like(self.env_blk, BLK)

        @partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(BLK, BLK, BLK, env_spec),
            out_specs=(BLK, REP, REP, REP, REP, BLK, BLK),
            check_vma=False,
        )
        def run(x_blk, u0_blk, rhs_blk, env_blk):
            x = peel(x_blk)
            u0 = peel(u0_blk)
            rhs = peel(rhs_blk)
            env = jax.tree_util.tree_map(peel, env_blk)
            # offsets arrive as (3,) vectors after peel
            u, iters, relres, fx, gx, dfdx, dgdx = self._physics_local(
                x, u0, rhs, env
            )
            return (
                unpeel(u), iters, relres, fx, gx, unpeel(dfdx),
                unpeel(dgdx),
            )

        return jax.jit(run)

    def compute_objective_constraints_sensitivities(self, x_blk, u0_blk):
        """Blocked-layout physics step; returns
        (u_blk, iters, relres, fx, gx, dfdx_blk, dgdx_blk)."""
        return self._solve_sm(x_blk, u0_blk, self.rhs_blk, self.env_blk)


class SpmdOptState(NamedTuple):
    x: jax.Array
    xTilde: jax.Array
    xPhys: jax.Array
    u: jax.Array
    L: jax.Array
    U: jax.Array
    xo1: jax.Array
    xo2: jax.Array
    fscale: jax.Array
    beta: jax.Array  # Heaviside projection sharpness (continuation)
    fx: jax.Array
    gx: jax.Array
    ch: jax.Array
    mnd: jax.Array
    solver_iters: jax.Array
    solver_relres: jax.Array
    u_pde: jax.Array  # PDE-filter warm start (PDEFilter.cc:285); dummy
    # (1,1,1)-block zeros when filter != 2
    pde_viol: jax.Array  # max bound violation of the last PDE-filter
    # apply (Filter.cc:82-97); 0 when filter != 2


class SpmdChunkedSolve:
    """Host-chunked SPMD state solve: the `-ksp_chunk` Krylov split
    (solvers/cg.PCGState) driven through the blocked-resident shard_map
    engine (parallel/blocked_spmd.py).  Built once and shared by
    `make_spmd_fused_step` (whole-iteration path) and the standalone
    `solve()` entry (the pod-engine state-solve probe,
    tools/probe_spmd_512.py) so both measure the SAME programs.

    Reference: the KSPSolve inside ComputeObjectiveConstraints-
    Sensitivities (LinearElasticity.cc:204,363-445).
    """

    def __init__(self, engine: "SpmdElasticity"):
        cfg = engine.cfg
        mesh = engine.mesh
        bspmd = engine._bspmd
        dt = engine.dtype
        env_spec = _spec_like(engine.env_blk, BLK)
        from topopt_in_petsc_tpu.solvers.cg import PCGState

        self.engine = engine
        self.cfg = cfg
        local_ndof = 3 * int(np.prod(engine.decomp.local_nn(0)))
        # chunk 0 (small problems, chunking off) = one full-length
        # chunk; the host loop below must always advance the cap
        self.chunk = cfg.resolve_ksp_chunk(local_ndof) or cfg.ksp_maxit

        # static structure of the carried solver env (solve_init strips
        # to CARRY_KEYS; masks/weights are iota-built, never carried)
        carry_spec = []
        for l in range(cfg.nlvls):
            d = {"eb": BLK, "dinvb": BLK, "lmax": REP}
            if l == 0 and bspmd.op32 is not bspmd.ops[0]:
                d["eb32"] = BLK
            carry_spec.append(d)
        pcg_spec = PCGState(
            x=BLK, r=BLK, p=BLK, rz=REP, rnorm=REP, bnorm=REP, k=REP,
        )

        def _unpeel_leaf(v):
            return v if v.ndim == 0 else unpeel(v)

        def _peel_leaf(v):
            return v if v.ndim == 0 else peel(v)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(BLK, BLK, BLK, env_spec),
            out_specs=(carry_spec, pcg_spec),
            check_vma=False,
        )
        def _pre(xPhys_blk, u0_blk, rhs_blk, env_blk):
            # u0_blk arrives in the KERNEL layout (the chunked state
            # keeps u blocked end-to-end): the donation into this
            # program aliases into PCGState.x — same layout, no dead
            # nodal shard buffer at peak
            x = peel(xPhys_blk)
            u0 = peel(u0_blk)
            E = engine.simp(x.astype(dt))
            carry, st = bspmd.solve_init(
                E, None, u0,
                rtol=cfg.ksp_rtol, ksp_type=cfg.ksp_type,
                x0_blocked=True,
            )
            carry = jax.tree_util.tree_map(_unpeel_leaf, carry)
            return carry, PCGState(*[_unpeel_leaf(v) for v in st])

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(carry_spec, pcg_spec, REP),
            out_specs=pcg_spec,
            check_vma=False,
        )
        def _chunk_step(carry_blk, st_blk, cap):
            carry = jax.tree_util.tree_map(_peel_leaf, carry_blk)
            st = PCGState(*[_peel_leaf(v) for v in st_blk])
            st = bspmd.solve_step(
                carry, st, cap, cfg.ksp_rtol, ksp_type=cfg.ksp_type
            )
            return PCGState(*[_unpeel_leaf(v) for v in st])

        # donate the warm-start u into the solve: same kernel layout as
        # PCGState.x, so the donation ALIASES (no unusable-donation
        # warning, no dead buffer at the solve's peak)
        self.pre_jit = jax.jit(_pre, donate_argnums=(1,))
        self.chunk_jit = jax.jit(_chunk_step, donate_argnums=(1,))

        # layout converters for the IO/restart boundaries (the chunked
        # state carries u in the kernel layout; SpmdDriver gathers the
        # nodal field only at output/checkpoint cadence)
        @partial(
            shard_map, mesh=mesh, in_specs=(BLK,), out_specs=BLK,
            check_vma=False,
        )
        def _u_to_nodal_sm(ub_blk):
            return unpeel(
                bspmd.op32.from_blocked(peel(ub_blk), engine.dtype)
            )

        @partial(
            shard_map, mesh=mesh, in_specs=(BLK,), out_specs=BLK,
            check_vma=False,
        )
        def _u_from_nodal_sm(u_blk):
            return unpeel(bspmd.op32.to_blocked(peel(u_blk)))

        engine.u_to_nodal_blk = jax.jit(_u_to_nodal_sm)
        engine.u_from_nodal_blk = jax.jit(_u_from_nodal_sm)

    def solve(self, xPhys_blk, u0_blk, callback=None):
        """Standalone host-chunked state solve from a blocked design
        field and a KERNEL-layout warm start (donated).  Returns the
        final PCGState (x in kernel layout) and the relative residual —
        the solve leg of the fused step, nothing else resident."""
        cfg = self.cfg
        engine = self.engine
        carry, pst = self.pre_jit(
            xPhys_blk, u0_blk, engine.rhs_blk, engine.env_blk
        )
        bnorm = float(pst.bnorm)
        tol = max(cfg.ksp_rtol * bnorm, 1e-50)
        while float(pst.rnorm) > tol and int(pst.k) < cfg.ksp_maxit:
            cap = jnp.asarray(
                min(int(pst.k) + self.chunk, cfg.ksp_maxit), jnp.int32
            )
            pst = self.chunk_jit(carry, pst, cap)
            if callback is not None:
                callback(
                    int(pst.k), float(pst.rnorm) / max(bnorm, 1e-300)
                )
        relres = float(pst.rnorm) / max(bnorm, 1e-300)
        return pst, relres


def make_spmd_chunked_solve(engine: "SpmdElasticity") -> SpmdChunkedSolve:
    return SpmdChunkedSolve(engine)


def make_spmd_fused_step(cfg: TopOptConfig, mesh: Mesh | None = None):
    """One full optimization iteration as a single SPMD program.

    Returns (step_fn, init_state, engine).  All design-shaped state is in
    blocked element layout; u in blocked nodal layout.
    """
    engine = SpmdElasticity(cfg, mesh)
    decomp = engine.decomp
    dt = engine.dtype
    mesh = engine.mesh
    mesh_shape = engine.mesh_shape

    # regularization: conv kernel + SPMD Hs for types 0/1 (ghost-filled
    # conv of ones), SpmdPDEFilter solves for type 2, passthrough else;
    # projection handled with the traced beta in the state
    conv_local = None
    pdef = None
    if cfg.filter in (0, 1):
        s = filter_stencil_halfwidth(
            cfg.rmin, engine.grid.h, engine.grid.nn
        )
        exl = decomp.local_ne(0)
        if any(s > e for e in exl):
            raise ValueError(
                f"filter stencil halfwidth {s} exceeds local block "
                f"{exl}; use the PDE filter or a larger block"
            )
        kernel_np = build_filter_kernel(cfg.rmin, engine.grid.h, s)
        kernel = jnp.asarray(kernel_np, dt)
        from topopt_in_petsc_tpu.ops.conv_filter import (
            FFT_TAP_THRESHOLD,
            make_fft_conv,
        )

        fft_conv_valid = None
        if (2 * s + 1) ** 3 > FFT_TAP_THRESHOLD:
            ghosted_shape = tuple(e + 2 * s for e in decomp.local_ne(0))
            fft_conv_valid = make_fft_conv(
                ghosted_shape, kernel_np, dt, crop_offset=s
            )

        def conv_local(x, fc):
            # fc: the FFT spectrum pair, threaded through the jit
            # boundary as ARGUMENTS — closed-over constants above
            # ~100 MB (the 384^3+ local spectra) are rejected by the
            # remote compile service with HTTP 413
            g = ghost_fill_elem(x, s, mesh_shape)
            if fft_conv_valid is not None:
                return fft_conv_valid(g, fc)
            out = lax.conv_general_dilated(
                g[None, None], kernel[None, None], (1, 1, 1), "VALID",
                dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            )
            return out[0, 0]

    elif cfg.filter == 2:
        from topopt_in_petsc_tpu.parallel.spmd_pde_filter import (
            SpmdPDEFilter,
        )

        pdef = SpmdPDEFilter(cfg, decomp, mesh)

    from topopt_in_petsc_tpu.opt.filters import (
        smooth_projection,
        smooth_projection_chainrule,
    )
    projection = bool(cfg.projectionFilter)
    eta = jnp.asarray(cfg.eta, dt)

    mma = MMA(
        engine.grid.nelem, cfg.m, decomp.local_ne(0), dt,
        precise_dots=cfg.precise_dots,
        reduce_sum=lambda v: psum_scalar(
            jnp.sum(v, dtype=jnp.float64 if cfg.precise_dots else dt)
        ),
        reduce_max=lambda v: pmax_scalar(jnp.max(v)),
        reduce_matrix=psum_scalar,
    )

    env_spec = _spec_like(engine.env_blk, BLK)
    pde_env_blk = pdef.env_blk if pdef is not None else {}
    pde_env_spec = _spec_like(pde_env_blk, BLK)
    # FFT filter spectra ride the jit boundary as a replicated-arg
    # pytree (empty when the direct conv / PDE filter is in use)
    fconsts = (
        fft_conv_valid.consts
        if (conv_local is not None and fft_conv_valid is not None)
        else ()
    )
    fconsts_spec = jax.tree_util.tree_map(lambda _: REP, fconsts)
    state_spec = SpmdOptState(
        x=BLK, xTilde=BLK, xPhys=BLK, u=BLK, L=BLK, U=BLK, xo1=BLK,
        xo2=BLK, fscale=REP, beta=REP, fx=REP, gx=REP, ch=REP, mnd=REP,
        solver_iters=REP, solver_relres=REP, u_pde=BLK, pde_viol=REP,
    )

    # external-mode donation split (see the comment inside make_step):
    # u_pde is a real (consumed) output only under the PDE filter —
    # otherwise it is a tiny placeholder passthrough and must NOT be
    # donated
    don_fields = ("xTilde", "xPhys", "L", "U", "xo2") + (
        ("u_pde",) if cfg.filter == 2 else ()
    )
    EXT_OUT_FIELDS = (
        "x", "xTilde", "xPhys", "L", "U", "fscale", "fx", "gx", "ch",
        "mnd", "u_pde", "pde_viol",
    )

    def make_step(
        first_iter: bool,
        fresh_asymptotes: bool,
        external_solve: bool = False,
    ):
        # external_solve: the state solve already ran (host-chunked
        # Krylov, see `step_chunked` below); this program receives the
        # solution in the op32 kernel layout + iters/relres and runs
        # only the objective/filter/MMA tail of the iteration.
        def core(state: SpmdOptState, rhs_blk, env_blk, pde_env_blk,
                 fc, ext):
            conv = (
                (lambda v: conv_local(v, fc))
                if conv_local is not None
                else None
            )
            s_loc = SpmdOptState(
                *[
                    peel(v) if spec is BLK else v
                    for v, spec in zip(state, state_spec)
                ]
            )
            rhs = peel(rhs_blk)
            env = jax.tree_util.tree_map(peel, env_blk)

            if external_solve:
                # chunked route: the state field stays in the solver's
                # KERNEL layout across iterations (u = xk pass-through);
                # the nodal field the u^T KE u quadform needs is a
                # TRANSIENT inside this program only — no dead nodal
                # shard buffer at the solve's peak (round-3 512^3 OOM)
                xk_blk, iters, relres = ext
                xk = peel(xk_blk)
                u_nodal = engine._bspmd.op32.from_blocked(
                    xk, engine.dtype
                )
                fx, gx, dfdx, dgdx = engine._objective_local(
                    s_loc.xPhys, u_nodal
                )
                u = xk
            else:
                (u, iters, relres, fx, gx, dfdx, dgdx) = (
                    engine._physics_local(
                        s_loc.xPhys, s_loc.u, rhs, env
                    )
                )
            # objective auto-scale at the first iteration (main.cc:68-73)
            fscale = 10.0 / fx if first_iter else s_loc.fscale
            dfdx = dfdx * fscale

            u_pde = s_loc.u_pde
            pde_viol = jnp.asarray(0.0, dt)
            if pdef is not None:
                pde_env = jax.tree_util.tree_map(peel, pde_env_blk)
                pde_env = pdef._setup_local(pde_env, s_loc.x.shape)

                def pde_apply(field, u0):
                    xt, unew, _, _ = pdef._solve_prepared(
                        field, u0, pde_env
                    )
                    return xt, unew

            Hs = (
                conv(jnp.ones_like(s_loc.x))
                if conv_local is not None
                else None
            )
            if projection:
                dproj = smooth_projection_chainrule(
                    s_loc.xTilde, s_loc.beta, eta
                )
                dfdx = dfdx * dproj
                dgdx = dgdx * dproj[None]
            if cfg.filter == 0:
                # sensitivity filter (Filter.cc:167-177)
                dfdx = conv(dfdx * s_loc.x) / Hs / s_loc.x
            elif cfg.filter == 1:
                dfdx = conv(dfdx / Hs)
                dgdx = jnp.stack(
                    [conv(dgdx[j] / Hs) for j in range(cfg.m)]
                )
            elif cfg.filter == 2:
                # PDE filter is self-adjoint: gradients are filtered by
                # the same Helmholtz solve (Filter.cc:193-200,
                # PDEFilter.cc:218); one warm-start vector is threaded
                # through all solves like the reference's single U
                dfdx, u_pde = pde_apply(dfdx, u_pde)
                rows = []
                for j in range(cfg.m):
                    row, u_pde = pde_apply(dgdx[j], u_pde)
                    rows.append(row)
                dgdx = jnp.stack(rows)
            xmin, xmax = mma._movelimit_impl(
                s_loc.x,
                jnp.asarray(cfg.Xmin, dt),
                jnp.asarray(cfg.Xmax, dt),
                jnp.asarray(cfg.movlim, dt),
            )
            x_new, L, U, lam, y, z = mma._update_impl(
                s_loc.x, dfdx, gx, dgdx, xmin, xmax,
                s_loc.L, s_loc.U, s_loc.xo1, s_loc.xo2,
                fresh_asymptotes=fresh_asymptotes,
            )
            ch = pmax_scalar(jnp.max(jnp.abs(x_new - s_loc.x)))
            if cfg.filter == 1:
                xTilde = conv(x_new) / Hs
            elif cfg.filter == 2:
                xt_raw, u_pde = pde_apply(x_new, u_pde)
                # bound-violation clip (Filter.cc:76-101); the max
                # violation is reported for the host to warn on
                pde_viol = pmax_scalar(
                    jnp.maximum(jnp.max(-xt_raw), jnp.max(xt_raw - 1.0))
                ).astype(dt)
                xTilde = jnp.clip(xt_raw, 0.0, 1.0)
            else:
                xTilde = x_new
            if projection:
                xPhys = smooth_projection(xTilde, s_loc.beta, eta)
            else:
                xPhys = xTilde
            nelem = engine.grid.nelem
            mnd = psum_scalar(
                jnp.sum(4.0 * xPhys * (1.0 - xPhys))
            ) / nelem
            return SpmdOptState(
                x=x_new, xTilde=xTilde, xPhys=xPhys, u=u, L=L, U=U,
                xo1=s_loc.x, xo2=s_loc.xo1, fscale=fscale,
                beta=s_loc.beta, fx=fx,
                gx=gx, ch=ch, mnd=mnd, solver_iters=iters,
                solver_relres=relres, u_pde=u_pde, pde_viol=pde_viol,
            )

        if not external_solve:
            # single-program iteration: no donation, the full state is
            # a safe output (identity passthroughs without donation are
            # plain copies)
            @partial(
                shard_map,
                mesh=mesh,
                in_specs=(state_spec, BLK, env_spec, pde_env_spec,
                          fconsts_spec),
                out_specs=state_spec,
                check_vma=False,
            )
            def step(state, rhs_blk, env_blk, pde_env_blk, fc):
                out = core(state, rhs_blk, env_blk, pde_env_blk, fc,
                           ())
                return SpmdOptState(
                    *[
                        unpeel(v) if spec is BLK else v
                        for v, spec in zip(out, state_spec)
                    ]
                )

            return jax.jit(step)

        # External (chunked) mode — the same donation layout as the
        # single-chip tail (parallel/fused_step.py): donating the WHOLE
        # state triggers a backend INVALID_ARGUMENT at >= 384^3-class
        # shards via its IDENTITY input->output aliases (u, x->xo1,
        # xo1->xo2; hardware-bisected round 5).  Only the consumed
        # element fields are donated; passthrough leaves are reattached
        # by the host loop (copy-free) and are not program outputs.
        kept_spec = {
            f: getattr(state_spec, f)
            for f in SpmdOptState._fields if f not in don_fields
        }
        don_spec = {f: getattr(state_spec, f) for f in don_fields}
        out_spec = {
            f: getattr(state_spec, f) for f in EXT_OUT_FIELDS
        }

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(kept_spec, don_spec, BLK, env_spec,
                      pde_env_spec, fconsts_spec, BLK, REP, REP),
            out_specs=out_spec,
            check_vma=False,
        )
        def step_ext(kept, don, rhs_blk, env_blk, pde_env_blk, fc,
                     xk_blk, iters, relres):
            out = core(
                SpmdOptState(**kept, **don), rhs_blk, env_blk,
                pde_env_blk, fc, (xk_blk, iters, relres),
            )
            return {
                f: (
                    unpeel(getattr(out, f))
                    if out_spec[f] is BLK else getattr(out, f)
                )
                for f in EXT_OUT_FIELDS
            }

        return jax.jit(step_ext, donate_argnums=(1,))

    # host-chunked state solve (the -ksp_chunk lever on the SPMD path):
    # per-shard work sets program runtime, so the auto rule uses LOCAL
    # dof — the same ~1-2-minute execution kill that forces chunking on
    # one chip applies to each pod chip (single-chip analogue:
    # models/elasticity._chunk_size)
    bspmd = engine._bspmd
    local_ndof = 3 * int(np.prod(engine.decomp.local_nn(0)))
    chunk = cfg.resolve_ksp_chunk(local_ndof)
    chunked = bspmd is not None and chunk > 0
    csolve = make_spmd_chunked_solve(engine) if chunked else None

    # three compiled variants cover the reference's k<3 asymptote logic
    # (GenSub, MMA.cc:532-537) and the itr==1 objective scale; rhs/env
    # flow as jit arguments (no large-array closures)
    _steps = {
        (True, True): make_step(True, True, external_solve=chunked),
        (False, True): make_step(False, True, external_solve=chunked),
        (False, False): make_step(False, False, external_solve=chunked),
    }

    if chunked:
        _pre_jit = csolve.pre_jit
        _chunk_jit = csolve.chunk_jit
        mx_, my_, mz_ = engine.mesh_shape

        def _dummy_u():
            # fresh each call: the tail DONATES the state, so a shared
            # placeholder buffer would be dead on the second iteration
            return engine._put_blk(
                np.zeros((mx_, my_, mz_, 1, 1, 1, 1), np.float32)
            )

        def _dedupe_state(s: SpmdOptState) -> SpmdOptState:
            """Donation needs distinct buffers per leaf; the init state
            aliases (x is xTilde is xo1 is xo2).  id()-based copy-on-
            duplicate — a no-op after the first iteration."""
            seen = set()
            out = []
            for v in s:
                if id(v) in seen:
                    v = v + jnp.zeros((), v.dtype)
                else:
                    seen.add(id(v))
                out.append(v)
            return SpmdOptState(*out)

    # standalone FilterProject over the SPMD blocks (main.cc:48-52's
    # pre-loop filter and the beta-continuation re-projection): same
    # filter tail as the fused step, without physics/MMA
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(BLK, REP, BLK, pde_env_spec, fconsts_spec),
        out_specs=(BLK, BLK, BLK),
        check_vma=False,
    )
    def _filter_project(x_blk, beta, u_pde_blk, pde_env_blk, fc):
        x = peel(x_blk)
        u_pde = peel(u_pde_blk)
        if cfg.filter == 1:
            Hs = conv_local(jnp.ones_like(x), fc)
            xTilde = conv_local(x, fc) / Hs
        elif cfg.filter == 2:
            pde_env = jax.tree_util.tree_map(peel, pde_env_blk)
            pde_env = pdef._setup_local(pde_env, x.shape)
            xt_raw, u_pde, _, _ = pdef._solve_prepared(
                x, u_pde, pde_env
            )
            xTilde = jnp.clip(xt_raw, 0.0, 1.0)
        else:  # filter 0 (sensitivity) / passthrough: design unfiltered
            xTilde = x
        if projection:
            xPhys = smooth_projection(xTilde, beta, eta)
        else:
            xPhys = xTilde
        return unpeel(xTilde), unpeel(xPhys), unpeel(u_pde)

    _filter_project_jit = jax.jit(_filter_project)

    def filter_project_blk(x_blk, beta, u_pde_blk):
        return _filter_project_jit(
            x_blk, beta, u_pde_blk, pde_env_blk, fconsts
        )

    engine.filter_project_blk = filter_project_blk

    if chunked:

        def step_jit(st: SpmdOptState, itr: int = 3):
            key = (itr == 1, itr <= 2)
            fn = _steps[key if key in _steps else (False, False)]
            # host-stepped Krylov: the full PCGState crosses the jit
            # boundary, so the chunked trajectory IS the single-program
            # solve (solvers/cg.PCGState semantics)
            st = _dedupe_state(st)
            carry, pst = _pre_jit(
                st.xPhys, st.u, engine.rhs_blk, engine.env_blk
            )
            # st.u was donated into the solve; the tail derives the new
            # u from the solver's kernel-layout solution
            st = st._replace(u=_dummy_u())
            bnorm = float(pst.bnorm)
            tol = max(cfg.ksp_rtol * bnorm, 1e-50)
            while (
                float(pst.rnorm) > tol and int(pst.k) < cfg.ksp_maxit
            ):
                cap = jnp.asarray(
                    min(int(pst.k) + chunk, cfg.ksp_maxit), jnp.int32
                )
                pst = _chunk_jit(carry, pst, cap)
                if cfg.ksp_monitor:
                    print(
                        f"  {int(pst.k):4d} KSP relative residual "
                        f"{float(pst.rnorm) / max(bnorm, 1e-300):.6e}",
                        flush=True,
                    )
            carry = None  # release solver env before the tail program
            relres = jnp.asarray(
                float(pst.rnorm) / max(bnorm, 1e-300), dt
            )
            kept = {
                f: getattr(st, f)
                for f in SpmdOptState._fields if f not in don_fields
            }
            don = {f: getattr(st, f) for f in don_fields}
            o = fn(
                kept, don, engine.rhs_blk, engine.env_blk,
                pde_env_blk, fconsts, pst.x, pst.k, relres,
            )
            # passthrough leaves reattached host-side (never program
            # outputs — the donation-safety layout): the solver's
            # kernel-layout solution IS the next warm start
            return SpmdOptState(
                x=o["x"], xTilde=o["xTilde"], xPhys=o["xPhys"],
                u=pst.x,
                L=o["L"], U=o["U"], xo1=st.x, xo2=st.xo1,
                fscale=o["fscale"], beta=st.beta,
                fx=o["fx"], gx=o["gx"], ch=o["ch"], mnd=o["mnd"],
                solver_iters=pst.k, solver_relres=relres,
                u_pde=o["u_pde"], pde_viol=o["pde_viol"],
            )

    else:

        def step_jit(st: SpmdOptState, itr: int = 3):
            key = (itr == 1, itr <= 2)
            fn = _steps[key if key in _steps else (False, False)]
            return fn(
                st, engine.rhs_blk, engine.env_blk, pde_env_blk,
                fconsts,
            )

    # initial state
    np_dt = np.float64 if cfg.dtype == "float64" else np.float32
    x0g = np.full(engine.grid.ne, cfg.volfrac, np_dt)
    span = cfg.Xmax - cfg.Xmin
    x0 = engine.blocked_elem(x0g)
    # initial filtered design (main.cc:48): conv preserves the constant
    # volfrac field; projection maps it through the smoothed Heaviside
    xPhys0 = (
        smooth_projection(x0, jnp.asarray(cfg.beta, dt), eta)
        if projection
        else x0
    )
    if pdef is not None:
        u_pde0 = pdef.u_blk
    else:
        mx, my, mz = mesh_shape
        u_pde0 = engine._put_blk(
            np.zeros((mx, my, mz, 1, 1, 1, 1), np_dt)
        )
    init = SpmdOptState(
        x=x0,
        xTilde=x0,
        xPhys=xPhys0,
        # chunked route: the state field lives in the solver's kernel
        # layout (no nodal shard buffer at the solve's peak)
        u=(engine.zeros_kernel_blk() if chunked
           else engine.zeros_nodal_blk()),
        L=engine.blocked_elem(x0g - 0.5 * span),
        U=engine.blocked_elem(x0g + 0.5 * span),
        xo1=x0,
        xo2=x0,
        fscale=jnp.asarray(1.0, dt),
        beta=jnp.asarray(cfg.beta, dt),
        fx=jnp.asarray(0.0, dt),
        gx=jnp.zeros((cfg.m,), dt),
        ch=jnp.asarray(1.0, dt),
        mnd=jnp.asarray(1.0, dt),
        solver_iters=jnp.asarray(0, jnp.int32),
        solver_relres=jnp.asarray(1.0, dt),
        u_pde=u_pde0,
        pde_viol=jnp.asarray(0.0, dt),
    )
    return step_jit, init, engine
