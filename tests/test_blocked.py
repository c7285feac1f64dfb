"""Blocked-resident operator/solver (ops/blocked_hex.py,
solvers/blocked_mg.py) vs the nodal-layout reference forms, in Pallas
interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.grid import Grid
from topopt_in_petsc_tpu.models.elements import hex8_stiffness
from topopt_in_petsc_tpu.ops.blocked_hex import BlockedHexOperator
from topopt_in_petsc_tpu.ops.hex_operator import (
    apply_hex_operator,
    hex_operator_absrowsum,
)
from topopt_in_petsc_tpu.solvers.blocked_mg import BlockedElasticityMG

NN = (9, 7, 5)


@pytest.fixture(scope="module", params=["single", "chunked"])
def op_and_data(request):
    grid = Grid(nn=NN, lo=(0, 0, 0), hi=(2, 1, 1))
    KE = hex8_stiffness(*grid.h, 0.3)
    # 'chunked': force y-chunking (YB > 1) with a tiny lane budget to
    # exercise the refresh/ownership paths that 512^3 uses
    cap = 80000 if request.param == "single" else 4 * (NN[2] + 2)
    op = BlockedHexOperator(NN, KE, lane_cap=cap, interpret=True)
    if request.param == "chunked":
        assert op.YB > 1
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(*NN, 3)), jnp.float32)
    E = jnp.asarray(rng.uniform(0.1, 1.0, size=grid.ne), jnp.float32)
    return grid, KE, op, u, E


def test_roundtrip(op_and_data):
    grid, KE, op, u, E = op_and_data
    ub = op.to_blocked(u)
    back = op.from_blocked(ub)
    np.testing.assert_allclose(np.asarray(back), np.asarray(u), rtol=1e-6)


def test_matvec_matches_nodal(op_and_data):
    grid, KE, op, u, E = op_and_data
    ref = apply_hex_operator(u, E, jnp.asarray(KE, jnp.float32))
    out = op.from_blocked(op.matvec(op.to_blocked(u), op.prepare_coef(E)))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5
    )


def test_matvec_after_refresh_of_garbage_halos(op_and_data):
    """Kernel output halo lanes are garbage; refresh must restore them
    before the next matvec (A(A(v)) consistency)."""
    grid, KE, op, u, E = op_and_data
    KEj = jnp.asarray(KE, jnp.float32)
    eb = op.prepare_coef(E)
    ref = apply_hex_operator(apply_hex_operator(u, E, KEj), E, KEj)
    vb = op.matvec(op.to_blocked(u), eb)  # halos now stale
    out = op.from_blocked(op.matvec(op.refresh(vb), eb))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5
    )


def test_mask0_matches_nodal_mask(op_and_data):
    grid, KE, op, u, E = op_and_data
    ub = op.mask0(op.to_blocked(u))
    ref = np.asarray(u).copy()
    ref[0, :, :, :] = 0.0
    np.testing.assert_allclose(
        np.asarray(op.from_blocked(ub)), ref, rtol=1e-6
    )


def test_dot_and_sum_match_nodal(op_and_data):
    grid, KE, op, u, E = op_and_data
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.normal(size=(*NN, 3)), jnp.float32)
    ub, vb = op.to_blocked(u), op.to_blocked(v)
    ref = float(jnp.vdot(u.astype(jnp.float64), v.astype(jnp.float64)))
    got = float(op.dot(ub, vb))
    assert got == pytest.approx(ref, rel=1e-5)
    # garbage outside ownership must not leak into the dot
    got2 = float(op.dot(op.refresh(ub + 0.0), vb))
    assert got2 == pytest.approx(ref, rel=1e-5)
    assert float(op.asum(ub)) == pytest.approx(
        float(jnp.sum(u.astype(jnp.float64))), rel=1e-5
    )


def test_blocked_solve_matches_multigrid_solver():
    """Full resident-layout MG-PCG vs the nodal GeometricMultigrid path
    on the cantilever problem."""
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.models.elasticity import LinearElasticity

    cfg = TopOptConfig(
        nx=9, ny=5, nz=5, nlvls=2, dtype="float32",
        operator_impl="xla", ksp_rtol=1e-7, ksp_maxit=200,
    )
    cfg.validate()
    phys = LinearElasticity(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.uniform(0.2, 0.9, size=phys.grid.ne), jnp.float32
    )
    ref = phys.solve_state(x)

    grids = phys.grid.hierarchy(cfg.nlvls)
    KEs = [hex8_stiffness(*g.h, cfg.nu) for g in grids]
    bmg = BlockedElasticityMG(
        grids, KEs, smooth_sweeps=cfg.smooth_sweeps,
        coarse_rtol=cfg.coarse_rtol, coarse_maxit=cfg.coarse_maxit,
        interpret=True,
    )
    op0 = bmg.ops[0]
    E = phys.simp(x)
    b = op0.mask0(op0.to_blocked(phys.RHS))
    res = bmg.solve(
        E, b, jnp.zeros_like(b), rtol=cfg.ksp_rtol, maxiter=200
    )
    u = op0.from_blocked(res.x)
    assert float(res.relres) < cfg.ksp_rtol
    # same linear system solved to 1e-7: fields agree to ~the tolerance
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(ref.x),
        rtol=1e-3, atol=1e-4 * float(jnp.max(jnp.abs(ref.x))),
    )
    # comparable MG quality: iteration counts in the same regime
    assert int(res.iters) <= int(ref.iters) + 5


def test_blocked_solve_fgmres():
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.models.elasticity import LinearElasticity

    cfg = TopOptConfig(
        nx=9, ny=5, nz=5, nlvls=2, dtype="float32",
        operator_impl="xla",
    )
    cfg.validate()
    phys = LinearElasticity(cfg)
    grids = phys.grid.hierarchy(cfg.nlvls)
    KEs = [hex8_stiffness(*g.h, cfg.nu) for g in grids]
    bmg = BlockedElasticityMG(grids, KEs, interpret=True)
    op0 = bmg.ops[0]
    x = jnp.full(phys.grid.ne, 0.5, jnp.float32)
    b = op0.mask0(op0.to_blocked(phys.RHS))
    res = bmg.solve(
        phys.simp(x), b, jnp.zeros_like(b), rtol=1e-6, maxiter=100,
        ksp_type="fgmres", gmres_restart=20,
    )
    assert float(res.relres) < 1e-6


def test_blocked_solve_bf16_vcycle():
    """mg_dtype=bfloat16: the V-cycle stores bf16 (kernel computes f32),
    the outer flexible CG stays f32 — the solution must still reach the
    f32 tolerance, only the iteration count may grow a little."""
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.models.elasticity import LinearElasticity

    cfg = TopOptConfig(
        nx=9, ny=5, nz=5, nlvls=2, dtype="float32",
        operator_impl="xla", ksp_rtol=1e-6, ksp_maxit=200,
    )
    cfg.validate()
    phys = LinearElasticity(cfg)
    grids = phys.grid.hierarchy(cfg.nlvls)
    KEs = [hex8_stiffness(*g.h, cfg.nu) for g in grids]
    bmg = BlockedElasticityMG(
        grids, KEs, mg_dtype=jnp.bfloat16, interpret=True,
    )
    op0 = bmg.op32
    assert op0 is not bmg.ops[0]  # separate f32 outer kernel
    x = jnp.full(phys.grid.ne, 0.5, jnp.float32)
    ref = phys.solve_state(x)
    b = op0.mask0(op0.to_blocked(phys.RHS))
    res = bmg.solve(
        phys.simp(x), b, jnp.zeros_like(b), rtol=1e-6, maxiter=200,
    )
    assert res.x.dtype == jnp.float32
    assert float(res.relres) < 1e-6
    u = op0.from_blocked(res.x)
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(ref.x),
        rtol=1e-2, atol=1e-3 * float(jnp.max(jnp.abs(ref.x))),
    )


def test_blocked_solve_mixed_vcycle():
    """mg_dtype="mixed": f32 fine-level smoothing, bf16 coarse levels.
    Fine level must be the SAME op as the outer Krylov's (no duplicate
    f32 kernel, no bf16 fine coefficient copy), coarse levels bf16; the
    solve still reaches the f32 tolerance."""
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.models.elasticity import LinearElasticity

    cfg = TopOptConfig(
        nx=9, ny=5, nz=5, nlvls=2, dtype="float32",
        operator_impl="xla", ksp_rtol=1e-6, ksp_maxit=200,
    )
    cfg.validate()
    phys = LinearElasticity(cfg)
    grids = phys.grid.hierarchy(cfg.nlvls)
    KEs = [hex8_stiffness(*g.h, cfg.nu) for g in grids]
    bmg = BlockedElasticityMG(
        grids, KEs, mg_dtype="mixed", interpret=True,
    )
    assert bmg.op32 is bmg.ops[0]  # fine level IS the f32 outer kernel
    assert bmg.ops[0].vdt == jnp.float32
    assert bmg.ops[1].vdt == jnp.bfloat16
    assert bmg.krylov_compress == jnp.bfloat16  # memory lever stays on
    op0 = bmg.op32
    x = jnp.full(phys.grid.ne, 0.5, jnp.float32)
    ref = phys.solve_state(x)
    b = op0.mask0(op0.to_blocked(phys.RHS))
    res = bmg.solve(
        phys.simp(x), b, jnp.zeros_like(b), rtol=1e-6, maxiter=200,
    )
    assert res.x.dtype == jnp.float32
    assert float(res.relres) < 1e-6
    u = op0.from_blocked(res.x)
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(ref.x),
        rtol=1e-2, atol=1e-3 * float(jnp.max(jnp.abs(ref.x))),
    )


def test_chunked_solve_identical_to_single_program():
    """solve_chunked carries the full Krylov state across jit calls:
    the trajectory must be IDENTICAL (not just convergent) to solve().

    The chunking exists because the TPU backend kills device
    executions beyond ~1-2 minutes (the 512^3 solve crashes at
    maxiter=200 and runs at maxiter=40 with identical memory)."""
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.models.elasticity import LinearElasticity

    cfg = TopOptConfig(
        nx=9, ny=5, nz=5, nlvls=2, dtype="float32", operator_impl="xla",
    )
    cfg.validate()
    phys = LinearElasticity(cfg)
    grids = phys.grid.hierarchy(cfg.nlvls)
    KEs = [hex8_stiffness(*g.h, cfg.nu) for g in grids]
    bmg = BlockedElasticityMG(grids, KEs, interpret=True)
    op0 = bmg.ops[0]
    x = jnp.full(phys.grid.ne, 0.5, jnp.float32)
    E = phys.simp(x)
    b = op0.mask0(op0.to_blocked(phys.RHS))

    ref = bmg.solve(E, b, jnp.zeros_like(b), rtol=1e-7, maxiter=60)
    ks = []
    got = bmg.solve_chunked(
        E, b, jnp.zeros_like(b), rtol=1e-7, maxiter=60, chunk=3,
        callback=lambda k, rr: ks.append(k),
    )
    assert int(got.iters) == int(ref.iters)
    ur = np.asarray(op0.from_blocked(ref.x))
    ug = np.asarray(op0.from_blocked(got.x))
    # same trajectory up to f32 rounding of differently-fused programs
    assert np.max(np.abs(ur - ug)) <= 1e-4 * np.max(np.abs(ur))
    assert float(got.relres) == pytest.approx(float(ref.relres), rel=1e-3)
    assert ks[-1] == int(got.iters) and len(ks) >= 2


def test_ksp_chunk_routing_in_solve_state():
    """-ksp_chunk N routes solve_state through the host-stepped solve
    with the same converged answer as the single-program path."""
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.models.elasticity import LinearElasticity

    kw = dict(nx=9, ny=5, nz=5, nlvls=2, dtype="float32",
              operator_impl="blocked", ksp_rtol=1e-6)
    cfg0 = TopOptConfig(**kw, ksp_chunk=0)
    cfg0.validate()
    phys0 = LinearElasticity(cfg0)
    x = jnp.full(phys0.grid.ne, 0.5, jnp.float32)
    ref = phys0.solve_state(x)

    cfg1 = TopOptConfig(**kw, ksp_chunk=2)
    cfg1.validate()
    phys1 = LinearElasticity(cfg1)
    got = phys1.solve_state(x)
    assert int(got.iters) == int(ref.iters)
    assert float(got.relres) < 1e-6
    ur, ug = np.asarray(ref.x), np.asarray(got.x)
    assert np.max(np.abs(ur - ug)) <= 1e-4 * np.max(np.abs(ur))


def test_fused_step_chunked_identical():
    """-ksp_chunk on the single-chip fused step: the iteration runs as
    host-chunked solve + tail program with a trajectory identical to
    the single-program fused step (the giga-dof execution-kill route,
    VERDICT r2 #3/#5)."""
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.parallel.fused_step import make_fused_step

    # rmin 0.3 -> stencil halfwidth 1: the tail program runs a REAL
    # convolution filter (rmin 0.24 on this grid degenerates to s=0)
    kw = dict(nx=9, ny=5, nz=5, nlvls=2, dtype="float32", rmin=0.3,
              operator_impl="blocked", ksp_rtol=1e-6)

    def run(ksp_chunk):
        cfg = TopOptConfig(**kw, ksp_chunk=ksp_chunk)
        cfg.validate()
        step, state = make_fused_step(cfg)
        hist = []
        for itr in (1, 2, 3):
            state = step(state, itr)
            hist.append(
                (float(state.fx), float(state.ch),
                 int(state.solver_iters))
            )
        return hist, state

    ref, sref = run(0)
    got, sgot = run(2)
    for (fr, cr, ir), (fg, cg, ig) in zip(ref, got):
        assert ig == ir
        assert fg == pytest.approx(fr, rel=1e-5)
        assert cg == pytest.approx(cr, rel=1e-4, abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(sgot.xPhys), np.asarray(sref.xPhys), atol=1e-5
    )


def test_cantilever_rhs_matches_nodal_builder(op_and_data):
    """The on-the-fly blocked RHS (index predicates, no nodal transient)
    must equal build_cantilever_bc's nodal RHS exactly — including the
    halved corner loads (LinearElasticity.cc:158-171)."""
    from topopt_in_petsc_tpu.models.elasticity import build_cantilever_bc

    grid, KE, op, u, E = op_and_data
    _, rhs_np = build_cantilever_bc(grid)
    got = np.asarray(op.from_blocked(op.cantilever_rhs()))
    np.testing.assert_allclose(got, rhs_np, rtol=1e-6, atol=0)
    # duplicated y-chunk halo lanes must hold consistent (true) values:
    # dot against a consistent field equals the nodal dot
    w = op.to_blocked(jnp.asarray(np.random.default_rng(0).normal(
        size=rhs_np.shape).astype(np.float32)))
    ref = float(jnp.vdot(op.from_blocked(w).astype(jnp.float64),
                         jnp.asarray(rhs_np, jnp.float64)))
    assert float(op.dot(w, op.cantilever_rhs())) == pytest.approx(
        ref, rel=1e-5, abs=1e-12
    )


def test_boundary_plane_get_add(op_and_data):
    """Blocked-layout boundary-plane slice/update vs nodal slicing —
    the primitive under the SPMD blocked halo exchange."""
    grid, KE, op, u, E = op_and_data
    nx, ny, nz = op.nn
    ub = op.to_blocked(u)
    un = np.asarray(u)
    rng = np.random.default_rng(11)
    for axis, n in ((0, nx), (1, ny), (2, nz)):
        for k in (0, n - 1):
            # get_plane holds the true values at the owned positions:
            # round-trip through add_plane and compare against nodal add
            plane = op.get_plane(ub, axis, k)
            ub2 = op.add_plane(ub, axis, k, plane)  # doubles plane k
            ref = un.copy()
            idx = [slice(None)] * 3
            idx[axis] = k
            ref[tuple(idx)] *= 2.0
            np.testing.assert_allclose(
                np.asarray(op.from_blocked(ub2)), ref, rtol=1e-6,
                err_msg=f"axis={axis} k={k}",
            )
            # adding a random plane lands exactly on plane k
            rp = jnp.asarray(
                rng.normal(size=plane.shape).astype(np.float32)
            )
            ub3 = op.add_plane(ub, axis, k, rp)
            out = np.asarray(op.from_blocked(ub3))
            ref2 = un.copy()
            mask = np.zeros_like(un, dtype=bool)
            mask[tuple(idx)] = True
            np.testing.assert_allclose(
                out[~mask], un[~mask], rtol=1e-6,
                err_msg=f"off-plane touched axis={axis} k={k}",
            )
            assert not np.allclose(out[mask], un[mask])


def test_absrowsum_stencil_matches_gather_form():
    grid = Grid(nn=(5, 4, 3), lo=(0, 0, 0), hi=(1, 0.7, 0.5))
    KE = jnp.asarray(hex8_stiffness(*grid.h, 0.3))
    rng = np.random.default_rng(0)
    E = jnp.asarray(rng.uniform(0.1, 1.0, size=grid.ne))
    ones = jnp.ones((*grid.nn, 3))
    ref = apply_hex_operator(ones, E, jnp.abs(KE))
    got = hex_operator_absrowsum(E, KE, grid.nn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-10)


def test_blocked_solve_bf16_fine_post_smooth():
    """fine_post_smooth: an f32 Chebyshev refinement appended to the
    bf16 V-cycle (resident f32 fine kernel).  Must converge to the f32
    tolerance in no MORE iterations than plain bf16 (it strictly
    improves the preconditioner), and stay a no-op for f32 V-cycles."""
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.models.elasticity import LinearElasticity

    cfg = TopOptConfig(
        nx=9, ny=5, nz=5, nlvls=2, dtype="float32",
        operator_impl="xla", ksp_rtol=1e-6, ksp_maxit=200,
    )
    cfg.validate()
    phys = LinearElasticity(cfg)
    grids = phys.grid.hierarchy(cfg.nlvls)
    KEs = [hex8_stiffness(*g.h, cfg.nu) for g in grids]
    x = jnp.full(phys.grid.ne, 0.5, jnp.float32)
    iters = {}
    for post in (0, 2):
        bmg = BlockedElasticityMG(
            grids, KEs, mg_dtype=jnp.bfloat16, interpret=True,
            fine_post_smooth=post,
        )
        op0 = bmg.op32
        b = op0.mask0(op0.to_blocked(phys.RHS))
        res = bmg.solve(
            phys.simp(x), b, jnp.zeros_like(b), rtol=1e-6, maxiter=200,
        )
        assert float(res.relres) < 1e-6
        iters[post] = int(res.iters)
    assert iters[2] <= iters[0]
    # f32 V-cycle: the option is disabled (op32 IS ops[0])
    bmg32 = BlockedElasticityMG(
        grids, KEs, interpret=True, fine_post_smooth=2,
    )
    assert bmg32.fine_post_smooth == 0
