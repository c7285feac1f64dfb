"""End-to-end gradient verification (SURVEY §4(f), VERDICT r1 #2).

Two independent anchors for the compliance sensitivity chain
(reference LinearElasticity.cc:363-445 + Filter.cc:120-204):

1. Central finite differences of fx(x) through the FULL pipeline
   filter -> state solve -> objective, compared against the chain-ruled
   dfdx (physics sensitivities pushed back through the filter), for
   density filter (1), PDE filter (2), density+projection, and
   passthrough — the configurations whose gradients are mathematically
   exact.  (The sensitivity filter, type 0, is a heuristic gradient
   smoothing by construction — Sigmund 1997 — so no FD identity exists;
   its operator form is verified in test_filters.py instead.)

2. A `jax.grad` cross-check of the self-adjoint formula
   dfdx = -p x^(p-1) (Emax - Emin) u^T KE u  (LinearElasticity.cc:423):
   autodiff through a dense jnp.linalg.solve of the masked system on a
   tiny grid must reproduce the analytic expression.

All in f64 (tests enable x64) with solver rtol tightened to 1e-12 so FD
noise stays at rounding level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.config import TopOptConfig
from topopt_in_petsc_tpu.grid import Grid
from topopt_in_petsc_tpu.models.elasticity import (
    LinearElasticity,
    build_cantilever_bc,
)
from topopt_in_petsc_tpu.models.elements import hex8_stiffness
from topopt_in_petsc_tpu.ops.hex_operator import (
    apply_hex_operator,
    element_quadratic_form,
)
from topopt_in_petsc_tpu.opt.filters import DesignFilter


def _make_problem(filter_type: int, projection: bool):
    cfg = TopOptConfig(
        nx=9, ny=5, nz=5, nlvls=2, dtype="float64",
        filter=filter_type, rmin=0.16,
        projectionFilter=projection, beta=2.0, eta=0.3,
        ksp_rtol=1e-13, ksp_maxit=400,
        pde_rtol=1e-13, pde_maxit=200, pde_nlvls=2,
        operator_impl="xla",
    )
    cfg.validate()
    grid = Grid.from_config(cfg)
    phys = LinearElasticity(cfg, grid)
    filt = DesignFilter(cfg, grid)
    return cfg, grid, phys, filt


def _fx(phys, filt, cfg, x):
    """Full-pipeline objective fx(x) (main.cc:98 -> main.cc:62)."""
    _, xPhys = filt.filter_project(
        x, cfg.projectionFilter, cfg.beta, cfg.eta
    )
    res = phys.compute_objective_constraints_sensitivities(xPhys)
    return float(res.fx)


def _chain_grad(phys, filt, cfg, x):
    """Chain-ruled dfdx exactly as the driver computes it
    (main.cc:62 physics sensitivities -> main.cc:76 filter gradients)."""
    xTilde, xPhys = filt.filter_project(
        x, cfg.projectionFilter, cfg.beta, cfg.eta
    )
    res = phys.compute_objective_constraints_sensitivities(xPhys)
    dfdx, _ = filt.gradients(
        x, xTilde, res.dfdx, res.dgdx,
        cfg.projectionFilter, cfg.beta, cfg.eta,
    )
    return np.asarray(dfdx)


@pytest.mark.parametrize(
    "filter_type,projection",
    [(1, False), (1, True), (2, False), (99, False)],
    ids=["density", "density+proj", "pde", "passthrough"],
)
def test_fd_gradient_through_full_pipeline(filter_type, projection):
    cfg, grid, phys, filt = _make_problem(filter_type, projection)
    rng = np.random.default_rng(11)
    # interior design away from the [0,1] clip so the pipeline is smooth
    x = jnp.asarray(
        rng.uniform(0.3, 0.7, size=grid.ne), dtype=jnp.float64
    )

    dfdx = _chain_grad(phys, filt, cfg, x)

    # probe elements spread across the domain, incl. near the load/wall
    ex, ey, ez = grid.ne
    probes = [(0, 0, 0), (ex - 1, ey // 2, 0), (ex // 2, ey - 1, ez - 1),
              (1, 2, 3), (ex - 2, 1, ez // 2)]
    h = 1e-6
    for e in probes:
        xp = x.at[e].add(h)
        xm = x.at[e].add(-h)
        fd = (_fx(phys, filt, cfg, xp) - _fx(phys, filt, cfg, xm)) / (2 * h)
        assert fd == pytest.approx(dfdx[e], rel=1e-5), (
            f"element {e}: FD {fd} vs chain rule {dfdx[e]}"
        )


def test_volume_constraint_gradient_fd():
    """gx = mean(xPhys) - volfrac; dgdx through the density filter must
    match FD too (Filter.cc:178-192 chain rule on the constraint)."""
    cfg, grid, phys, filt = _make_problem(1, False)
    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.uniform(0.3, 0.7, size=grid.ne), dtype=jnp.float64
    )

    def gx_of(x):
        _, xPhys = filt.filter_project(x, False, cfg.beta, cfg.eta)
        return float(jnp.mean(xPhys)) - cfg.volfrac

    xTilde, xPhys = filt.filter_project(x, False, cfg.beta, cfg.eta)
    res = phys.compute_objective_constraints_sensitivities(xPhys)
    _, dgdx = filt.gradients(
        x, xTilde, res.dfdx, res.dgdx, False, cfg.beta, cfg.eta
    )
    dgdx = np.asarray(dgdx[0])

    h = 1e-6
    for e in [(0, 1, 2), (3, 2, 1), (grid.ne[0] - 1, 0, 0)]:
        fd = (gx_of(x.at[e].add(h)) - gx_of(x.at[e].add(-h))) / (2 * h)
        assert fd == pytest.approx(dgdx[e], rel=1e-6, abs=1e-12)


def test_jax_grad_cross_check_self_adjoint_formula():
    """Autodiff through a dense masked solve == the analytic self-adjoint
    sensitivity -p x^(p-1)(Emax-Emin) uKEu (LinearElasticity.cc:405-424)."""
    nn = (5, 3, 3)
    cfg = TopOptConfig(nx=5, ny=3, nz=3, nlvls=1, dtype="float64")
    grid = Grid(nn=nn, lo=(0, 0, 0), hi=(2.0, 1.0, 1.0))
    KE = jnp.asarray(hex8_stiffness(*grid.h, cfg.nu), jnp.float64)
    N_np, RHS_np = build_cantilever_bc(grid)
    N = jnp.asarray(N_np)
    rhs = jnp.asarray(RHS_np)
    ndof = 3 * grid.nnode

    def masked_apply(xPhys, v):
        E = cfg.Emin + xPhys**cfg.penal * (cfg.Emax - cfg.Emin)
        Kv = apply_hex_operator(N * v, E, KE)
        return N * Kv + (1.0 - N) * v

    eye = jnp.eye(ndof, dtype=jnp.float64)

    def fx_dense(xPhys):
        cols = jax.vmap(
            lambda c: masked_apply(xPhys, c.reshape(*nn, 3)).ravel()
        )(eye)
        K = cols.T  # column i = A e_i
        u = jnp.linalg.solve(K, rhs.ravel()).reshape(*nn, 3)
        E = cfg.Emin + xPhys**cfg.penal * (cfg.Emax - cfg.Emin)
        return jnp.sum(E * element_quadratic_form(u, KE))

    rng = np.random.default_rng(2)
    xPhys = jnp.asarray(
        rng.uniform(0.2, 0.9, size=grid.ne), dtype=jnp.float64
    )

    g_auto = jax.grad(fx_dense)(xPhys)

    # analytic: solve once, apply the formula
    cols = jax.vmap(
        lambda c: masked_apply(xPhys, c.reshape(*nn, 3)).ravel()
    )(eye)
    u = jnp.linalg.solve(cols.T, rhs.ravel()).reshape(*nn, 3)
    uKu = element_quadratic_form(u, KE)
    g_analytic = (
        -cfg.penal * xPhys ** (cfg.penal - 1.0) * (cfg.Emax - cfg.Emin)
    ) * uKu

    np.testing.assert_allclose(
        np.asarray(g_auto), np.asarray(g_analytic), rtol=1e-9
    )
