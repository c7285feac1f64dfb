"""Pallas hex-operator kernel: correctness in interpreter mode (CPU).

On real TPU hardware the kernel is selected via
`TopOptConfig(operator_impl="pallas")` and is used both for the outer
CG matvec and the fine level of the V-cycle.  The kernel layout is
dictated by hardware-probed Mosaic constraints of this axon build
(leading-dim-only DMA slices, 8-aligned extents, lane rolls for y/z
shifts) — see ops/pallas_hex.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.grid import Grid
from topopt_in_petsc_tpu.models.elements import hex8_stiffness
from topopt_in_petsc_tpu.ops.hex_operator import apply_hex_operator
from topopt_in_petsc_tpu.ops.pallas_hex import make_pallas_hex_apply


def _case(nn, seed=0):
    grid = Grid(nn=nn, lo=(0, 0, 0), hi=(2, 1, 1))
    KE = hex8_stiffness(*grid.h, 0.3)
    rng = np.random.default_rng(seed)
    E = jnp.asarray(rng.uniform(0.1, 1.0, size=grid.ne), jnp.float32)
    u = jnp.asarray(rng.normal(size=(*grid.nn, 3)), jnp.float32)
    ref = apply_hex_operator(u, E, jnp.asarray(KE, jnp.float32))
    return grid, KE, E, u, ref


@pytest.mark.parametrize(
    "nn,tx",
    [((9, 7, 5), 4), ((17, 9, 9), 8), ((12, 12, 12), 8),
     ((65, 33, 33), 8)],
)
def test_pallas_interpret_matches_xla(nn, tx):
    grid, KE, E, u, ref = _case(nn)
    ap = make_pallas_hex_apply(grid.nn, KE, tx=tx, interpret=True)
    got = ap(u, E)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-5


@pytest.mark.parametrize(
    "nn,yc",
    [((33, 29, 17), 8), ((25, 21, 13), 10), ((12, 12, 12), 5)],
)
def test_pallas_ychunked_matches(nn, yc):
    """Forced y-chunking (the large-grid path), incl. uneven last
    chunk."""
    grid, KE, E, u, ref = _case(nn, seed=2)
    ap = make_pallas_hex_apply(grid.nn, KE, yc=yc, interpret=True)
    got = ap(u, E)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-5, f"yc={yc} err={err}"


def test_pallas_fine_apply_in_multigrid():
    """operator_impl='pallas' (interpret) plugged into the full solve
    matches the XLA solve."""
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.models.elasticity import LinearElasticity

    cfg = TopOptConfig(nx=17, ny=9, nz=9, nlvls=2, maxItr=1)
    cfg.validate()
    fe_x = LinearElasticity(cfg)

    cfg2 = TopOptConfig(nx=17, ny=9, nz=9, nlvls=2, maxItr=1)
    cfg2.validate()
    fe_p = LinearElasticity(cfg2)
    from topopt_in_petsc_tpu.ops.pallas_hex import make_pallas_hex_apply

    fe_p._pallas_apply = make_pallas_hex_apply(
        fe_p.grid.nn, np.asarray(fe_p.KE), interpret=True
    )
    fe_p.mg.fine_apply = fe_p._pallas_apply
    fe_p._solve = jax.jit(fe_p._solve_impl)

    x = jnp.full(fe_x.grid.ne, 0.3, jnp.float32)
    r1 = fe_x.solve_state(x)
    r2 = fe_p.solve_state(x)
    # two different f32 summation orders through an iterative solve:
    # both converge to ksp_rtol=1e-5 of ||b||, so compare at the
    # corresponding solution scale, not bitwise
    assert float(r1.relres) < cfg.ksp_rtol
    assert float(r2.relres) < cfg2.ksp_rtol
    scale = float(np.max(np.abs(np.asarray(r1.x))))
    np.testing.assert_allclose(
        np.asarray(r2.x), np.asarray(r1.x), rtol=1e-3,
        atol=1e-3 * scale,
    )


@pytest.mark.parametrize(
    "nn,kw",
    [((17, 9, 9), {}), ((33, 29, 17), dict(yc=8)),
     ((12, 12, 12), dict(yc=5))],
)
def test_pallas_helmholtz_matches(nn, kw):
    """dof=1 Helmholtz kernel (the PDE-filter operator) vs XLA."""
    from topopt_in_petsc_tpu.models.elements import (
        helmholtz_element_matrices,
    )
    from topopt_in_petsc_tpu.ops.pallas_hex import (
        make_pallas_helmholtz_apply,
    )

    grid = Grid(nn=nn, lo=(0, 0, 0), hi=(2, 1, 1))
    KF, _ = helmholtz_element_matrices(*grid.h, 0.03)
    rng = np.random.default_rng(0)
    E = jnp.asarray(rng.uniform(0.1, 1.0, size=grid.ne), jnp.float32)
    u = jnp.asarray(rng.normal(size=(*grid.nn, 1)), jnp.float32)
    ref = apply_hex_operator(u, E, jnp.asarray(KF, jnp.float32))
    got = make_pallas_helmholtz_apply(
        grid.nn, KF, interpret=True, **kw
    )(u, E)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-5


@pytest.mark.parametrize(
    "nn,kw",
    [((9, 7, 5), dict(tx=4)), ((17, 9, 9), {}),
     ((33, 29, 17), dict(yc=8)), ((12, 12, 12), dict(yc=5))],
)
def test_pallas_quadform_matches(nn, kw):
    """Element quadratic form kernel vs the XLA gather form."""
    from topopt_in_petsc_tpu.ops.hex_operator import (
        element_quadratic_form,
    )
    from topopt_in_petsc_tpu.ops.pallas_hex import make_pallas_quadform

    grid = Grid(nn=nn, lo=(0, 0, 0), hi=(2, 1, 1))
    KE = hex8_stiffness(*grid.h, 0.3)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(*grid.nn, 3)), jnp.float32)
    ref = element_quadratic_form(u, jnp.asarray(KE, jnp.float32))
    got = make_pallas_quadform(grid.nn, KE, interpret=True, **kw)(u)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-5
