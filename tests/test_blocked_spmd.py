"""Blocked-resident SPMD engine (parallel/blocked_spmd.py): halo
exchange on blocked arrays + full per-shard MG-PCG vs the single-device
paths, on the 8-virtual-device CPU mesh (interpret-mode kernels)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from topopt_in_petsc_tpu.config import TopOptConfig
from topopt_in_petsc_tpu.grid import Grid
from topopt_in_petsc_tpu.models.elasticity import (
    LinearElasticity,
    build_cantilever_bc,
)
from topopt_in_petsc_tpu.models.elements import hex8_stiffness
from topopt_in_petsc_tpu.ops.blocked_hex import BlockedHexOperator
from topopt_in_petsc_tpu.ops.hex_operator import apply_hex_operator
from topopt_in_petsc_tpu.parallel.blocked_spmd import (
    BlockedSpmdMG,
    halo_accumulate_blocked,
)
from topopt_in_petsc_tpu.parallel.decomp import BlockDecomp
from topopt_in_petsc_tpu.parallel.mesh import make_device_mesh
from topopt_in_petsc_tpu.parallel.spmd import AXIS_NAMES, peel, unpeel

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

MESH_SHAPE = (2, 2, 2)
NN = (17, 9, 9)


def test_blocked_halo_matvec_matches_global():
    """Per-shard blocked free matvec + blocked halo accumulate ==
    global nodal operator."""
    grid = Grid(nn=NN, lo=(0, 0, 0), hi=(2, 1, 1))
    d = BlockDecomp(grid, MESH_SHAPE, nlvls=1)
    mesh = make_device_mesh(MESH_SHAPE)
    KE = hex8_stiffness(*grid.h, 0.3)
    rng = np.random.default_rng(5)
    u = rng.normal(size=(*NN, 3)).astype(np.float32)
    E = rng.uniform(0.1, 1.0, size=grid.ne).astype(np.float32)
    ref = apply_hex_operator(
        jnp.asarray(u), jnp.asarray(E), jnp.asarray(KE, jnp.float32)
    )

    op = BlockedHexOperator(d.local_nn(0), KE, interpret=True)
    u_blk = jnp.asarray(d.to_blocked_nodal(u))
    E_blk = jnp.asarray(d.to_blocked_elem(E[..., None])[..., 0])

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(*AXIS_NAMES),
        out_specs=P(*AXIS_NAMES),
        check_vma=False,
    )
    def run(u_loc, E_loc):
        ul = peel(u_loc)
        El = peel(E_loc)
        vb = op.to_blocked(ul)
        eb = op.prepare_coef(El)
        Kv = op.matvec(op.refresh(vb), eb)
        Kv = halo_accumulate_blocked(Kv, op, MESH_SHAPE)
        return unpeel(op.from_blocked(Kv))

    blk = run(u_blk, E_blk)
    got = d.from_blocked_nodal(np.asarray(blk))
    np.testing.assert_allclose(
        got, np.asarray(ref), rtol=3e-5, atol=3e-5
    )
    # duplicated shard planes hold identical totals
    b = np.asarray(blk)
    np.testing.assert_allclose(b[0, 0, 0, -1], b[1, 0, 0, 0], rtol=1e-6)


def test_spmd_engine_blocked_impl_matches_xla():
    """SpmdElasticity with operator_impl='blocked' (the TPU multi-chip
    default) == the XLA nodal path, through the full physics step."""
    from topopt_in_petsc_tpu.parallel.spmd_model import SpmdElasticity

    common = dict(
        nx=NN[0], ny=NN[1], nz=NN[2], nlvls=2, dtype="float32",
        rmin=0.16, mesh_shape=MESH_SHAPE,
    )
    rng = np.random.default_rng(9)
    x = rng.uniform(0.2, 0.9, size=(NN[0] - 1, NN[1] - 1, NN[2] - 1))

    cfg1 = TopOptConfig(**common)
    cfg1.validate()
    e1 = SpmdElasticity(cfg1)
    ref = e1.compute_objective_constraints_sensitivities(
        e1.blocked_elem(x), e1.zeros_nodal_blk()
    )

    cfg2 = TopOptConfig(operator_impl="blocked", **common)
    cfg2.validate()
    e2 = SpmdElasticity(cfg2)
    assert e2._bspmd is not None
    got = e2.compute_objective_constraints_sensitivities(
        e2.blocked_elem(x), e2.zeros_nodal_blk()
    )

    assert float(got[3]) == pytest.approx(float(ref[3]), rel=1e-4)  # fx
    u_ref = e1.decomp.from_blocked_nodal(np.asarray(ref[0]))
    u_got = e2.decomp.from_blocked_nodal(np.asarray(got[0]))
    scale = np.max(np.abs(u_ref))
    np.testing.assert_allclose(
        u_got, u_ref, rtol=1e-3, atol=2e-4 * scale
    )
    assert abs(int(got[1]) - int(ref[1])) <= 3  # iters


def test_blocked_spmd_dot_accuracy():
    """dot_fn == the exact (math.fsum) global inner product to f64
    accumulation grade: per-row f32 partials + f64 across partials +
    psum, duplicated shard planes counted once (VERDICT r2 weak #6)."""
    import math

    grid = Grid(nn=NN, lo=(0, 0, 0), hi=(2, 1, 1))
    d = BlockDecomp(grid, MESH_SHAPE, nlvls=1)
    mesh = make_device_mesh(MESH_SHAPE)
    KE = hex8_stiffness(*grid.h, 0.3)
    bmg = BlockedSpmdMG(d, [KE], interpret=True, precise_dots=True)

    rng = np.random.default_rng(11)
    a = rng.normal(size=(*NN, 3)).astype(np.float32)
    b = rng.normal(size=(*NN, 3)).astype(np.float32)
    exact = math.fsum(
        (a.astype(np.float64) * b.astype(np.float64)).ravel()
    )

    a_blk = jnp.asarray(d.to_blocked_nodal(a))
    b_blk = jnp.asarray(d.to_blocked_nodal(b))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(*AXIS_NAMES),) * 2,
        out_specs=P(),
        check_vma=False,
    )
    def run(a_loc, b_loc):
        op = bmg.ops[0]
        ab = op.to_blocked(peel(a_loc))
        bb = op.to_blocked(peel(b_loc))
        return bmg.dot_fn(0)(ab, bb)

    got = float(run(a_blk, b_blk))
    assert got == pytest.approx(exact, rel=2e-7)


def test_blocked_fallback_warns(capsys):
    """Requesting -operator_impl blocked with a config the resident
    stack can't run (fgmres / f64) falls back LOUDLY, not silently."""
    from topopt_in_petsc_tpu.parallel.spmd_model import SpmdElasticity

    common = dict(
        nx=NN[0], ny=NN[1], nz=NN[2], nlvls=2, rmin=0.16,
        mesh_shape=MESH_SHAPE,
    )
    cfg = TopOptConfig(
        operator_impl="blocked", ksp_type="fgmres", dtype="float32",
        **common,
    )
    cfg.validate()
    e = SpmdElasticity(cfg)
    assert e._bspmd is None
    out = capsys.readouterr().out
    assert "does not support ksp_type=fgmres" in out

    # single-chip analogue: float64 config downgrades to the xla path
    cfg2 = TopOptConfig(
        nx=9, ny=5, nz=5, nlvls=2, dtype="float64",
        operator_impl="blocked",
    )
    cfg2.validate()
    phys = LinearElasticity(cfg2)
    assert phys._bsolver is None
    out = capsys.readouterr().out
    assert "float32-only" in out


@pytest.mark.slow
def test_spmd_chunked_step_identical_to_single_program():
    """-ksp_chunk on the SPMD engine: the host-stepped Krylov carries
    the full PCGState across jit calls, so the fused-step trajectory
    must be IDENTICAL (not just convergent) to the single-program step
    (VERDICT r2 #5; mirrors test_blocked.py's single-chip version)."""
    from topopt_in_petsc_tpu.parallel.spmd_model import (
        make_spmd_fused_step,
    )

    common = dict(
        nx=NN[0], ny=NN[1], nz=NN[2], nlvls=2, dtype="float32",
        rmin=0.16, mesh_shape=MESH_SHAPE, operator_impl="blocked",
        ksp_rtol=1e-6, ksp_maxit=100,
    )

    def run(ksp_chunk):
        cfg = TopOptConfig(ksp_chunk=ksp_chunk, **common)
        cfg.validate()
        step, state, _ = make_spmd_fused_step(cfg)
        hist = []
        for itr in (1, 2, 3):
            state = step(state, itr)
            hist.append(
                (
                    float(state.fx),
                    float(state.ch),
                    int(state.solver_iters),
                    float(state.solver_relres),
                )
            )
        return hist, state

    ref, sref = run(0)
    got, sgot = run(3)
    for (fr, cr, ir, rr), (fg, cg, ig, rg) in zip(ref, got):
        assert ig == ir  # same Krylov trajectory -> same iteration count
        assert fg == pytest.approx(fr, rel=1e-5)
        assert cg == pytest.approx(cr, rel=1e-4, abs=1e-6)
        assert rg == pytest.approx(rr, rel=1e-2)
    xr = np.asarray(sref.xPhys)
    xg = np.asarray(sgot.xPhys)
    assert np.max(np.abs(xr - xg)) < 1e-5


@pytest.mark.slow
def test_spmd_chunked_bf16_identical():
    """The PRODUCTION giga-dof configuration — bf16 V-cycle + Krylov
    compression + host-chunked outer loop — is trajectory-identical to
    its unchunked form (chunking must not interact with compression)."""
    from topopt_in_petsc_tpu.parallel.spmd_model import (
        make_spmd_fused_step,
    )

    common = dict(
        nx=NN[0], ny=NN[1], nz=NN[2], nlvls=2, dtype="float32",
        rmin=0.16, mesh_shape=MESH_SHAPE, operator_impl="blocked",
        mg_dtype="bfloat16", ksp_rtol=1e-5, ksp_maxit=100,
    )

    def run(ksp_chunk):
        cfg = TopOptConfig(ksp_chunk=ksp_chunk, **common)
        cfg.validate()
        step, state, _ = make_spmd_fused_step(cfg)
        for itr in (1, 2):
            state = step(state, itr)
        return state

    sref = run(0)
    sgot = run(3)
    assert int(sgot.solver_iters) == int(sref.solver_iters)
    assert float(sgot.fx) == pytest.approx(float(sref.fx), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(sgot.xPhys), np.asarray(sref.xPhys), atol=2e-5
    )


def test_spmd_mg_dtype_bf16_converges():
    """-mg_dtype bfloat16 on the SPMD engine: bf16 V-cycle storage with
    the f32 outer Krylov still converges to the f32 solution (the
    512^3-class memory lever, per shard; VERDICT r2 #5)."""
    from topopt_in_petsc_tpu.parallel.spmd_model import SpmdElasticity

    common = dict(
        nx=NN[0], ny=NN[1], nz=NN[2], nlvls=2, dtype="float32",
        rmin=0.16, mesh_shape=MESH_SHAPE, operator_impl="blocked",
        ksp_rtol=1e-5,
    )
    rng = np.random.default_rng(21)
    x = rng.uniform(0.3, 0.9, size=(NN[0] - 1, NN[1] - 1, NN[2] - 1))

    cfg1 = TopOptConfig(**common)
    cfg1.validate()
    e1 = SpmdElasticity(cfg1)
    ref = e1.compute_objective_constraints_sensitivities(
        e1.blocked_elem(x), e1.zeros_nodal_blk()
    )

    cfg2 = TopOptConfig(mg_dtype="bfloat16", **common)
    cfg2.validate()
    e2 = SpmdElasticity(cfg2)
    assert e2._bspmd.op32 is not e2._bspmd.ops[0]
    assert e2._bspmd.krylov_compress == jnp.bfloat16
    got = e2.compute_objective_constraints_sensitivities(
        e2.blocked_elem(x), e2.zeros_nodal_blk()
    )

    assert float(got[2]) < cfg2.ksp_rtol  # converged (relres)
    assert float(got[3]) == pytest.approx(float(ref[3]), rel=1e-3)  # fx
    u_ref = e1.decomp.from_blocked_nodal(np.asarray(ref[0]))
    u_got = e2.decomp.from_blocked_nodal(np.asarray(got[0]))
    scale = np.max(np.abs(u_ref))
    np.testing.assert_allclose(
        u_got, u_ref, rtol=1e-2, atol=1e-3 * scale
    )


def test_spmd_mg_dtype_mixed_converges():
    """-mg_dtype mixed on the SPMD engine: f32 fine level (shared with
    the outer Krylov), bf16 coarse levels — converges to the f32
    solution (VERDICT r3 #7)."""
    from topopt_in_petsc_tpu.parallel.spmd_model import SpmdElasticity

    common = dict(
        nx=NN[0], ny=NN[1], nz=NN[2], nlvls=2, dtype="float32",
        rmin=0.16, mesh_shape=MESH_SHAPE, operator_impl="blocked",
        ksp_rtol=1e-5,
    )
    rng = np.random.default_rng(21)
    x = rng.uniform(0.3, 0.9, size=(NN[0] - 1, NN[1] - 1, NN[2] - 1))

    cfg1 = TopOptConfig(**common)
    cfg1.validate()
    e1 = SpmdElasticity(cfg1)
    ref = e1.compute_objective_constraints_sensitivities(
        e1.blocked_elem(x), e1.zeros_nodal_blk()
    )

    cfg2 = TopOptConfig(mg_dtype="mixed", **common)
    cfg2.validate()
    e2 = SpmdElasticity(cfg2)
    assert e2._bspmd.op32 is e2._bspmd.ops[0]  # fine level shared, f32
    assert e2._bspmd.ops[1].vdt == jnp.bfloat16
    assert e2._bspmd.krylov_compress == jnp.bfloat16
    got = e2.compute_objective_constraints_sensitivities(
        e2.blocked_elem(x), e2.zeros_nodal_blk()
    )

    assert float(got[2]) < cfg2.ksp_rtol  # converged (relres)
    assert float(got[3]) == pytest.approx(float(ref[3]), rel=1e-3)  # fx
    u_ref = e1.decomp.from_blocked_nodal(np.asarray(ref[0]))
    u_got = e2.decomp.from_blocked_nodal(np.asarray(got[0]))
    scale = np.max(np.abs(u_ref))
    np.testing.assert_allclose(
        u_got, u_ref, rtol=1e-2, atol=1e-3 * scale
    )


@pytest.mark.slow
def test_blocked_spmd_solve_matches_single_device():
    """Full resident-blocked SPMD MG-PCG == single-device solve."""
    cfg = TopOptConfig(
        nx=NN[0], ny=NN[1], nz=NN[2], nlvls=2, dtype="float32",
        rmin=0.16, mesh_shape=MESH_SHAPE, ksp_rtol=1e-6, ksp_maxit=100,
    )
    cfg.validate()
    rng = np.random.default_rng(7)
    x = rng.uniform(0.3, 0.9, size=(NN[0] - 1, NN[1] - 1, NN[2] - 1))
    phys = LinearElasticity(cfg)
    ref = phys.solve_state(jnp.asarray(x, jnp.float32))

    grid = Grid.from_config(cfg)
    d = BlockDecomp(grid, MESH_SHAPE, nlvls=cfg.nlvls)
    mesh = make_device_mesh(MESH_SHAPE)
    grids = grid.hierarchy(cfg.nlvls)
    KEs = [hex8_stiffness(*g.h, cfg.nu) for g in grids]
    bmg = BlockedSpmdMG(
        d, KEs, smooth_sweeps=cfg.smooth_sweeps,
        coarse_rtol=cfg.coarse_rtol, coarse_maxit=cfg.coarse_maxit,
        interpret=True,
    )

    N_np, RHS_np = build_cantilever_bc(grid, dtype=np.float32)
    E = phys.simp(jnp.asarray(x, jnp.float32))
    E_blk = jnp.asarray(d.to_blocked_elem(np.asarray(E)[..., None])[..., 0])
    b_blk = jnp.asarray(d.to_blocked_nodal(RHS_np * N_np))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(*AXIS_NAMES), P(*AXIS_NAMES)),
        out_specs=(P(*AXIS_NAMES), P(), P()),
        check_vma=False,
    )
    def run(E_loc, b_loc):
        El = peel(E_loc)
        bl = peel(b_loc)
        res = bmg.solve(
            El, bl, jnp.zeros_like(bl),
            rtol=cfg.ksp_rtol, maxiter=cfg.ksp_maxit,
        )
        return unpeel(res.x), res.iters, res.relres

    # the on-the-fly shard-local RHS must equal the nodal builder's
    # (incl. corner halving at GLOBAL y extremes and shard gating)
    @partial(
        shard_map, mesh=mesh, in_specs=(),
        out_specs=P(*AXIS_NAMES), check_vma=False,
    )
    def rhs_run():
        op = bmg.op32
        return unpeel(op.from_blocked(bmg.local_rhs()))

    got_rhs = d.from_blocked_nodal(np.asarray(rhs_run()))
    np.testing.assert_allclose(got_rhs, RHS_np * N_np, atol=0)

    u_blk, iters, relres = run(E_blk, b_blk)
    assert float(relres) < cfg.ksp_rtol
    u = d.from_blocked_nodal(np.asarray(u_blk))
    scale = float(jnp.max(jnp.abs(ref.x)))
    np.testing.assert_allclose(
        u, np.asarray(ref.x), rtol=1e-3, atol=2e-4 * scale
    )
    # same preconditioner quality: iteration counts in the same regime
    assert abs(int(iters) - int(ref.iters)) <= 3
