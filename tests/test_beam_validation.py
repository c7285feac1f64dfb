"""External physics anchor: the cantilever state solve vs Timoshenko
beam theory.

The golden-run trajectory (docs/GOLDEN_RUN.md) is framework-vs-itself;
this test anchors the PHYSICS against a value the framework cannot
influence: the textbook tip deflection of a slender solid cantilever,

    delta = P L^3 / (3 E I)  +  P L / (kappa G A)

(Euler-Bernoulli bending + Timoshenko shear correction, kappa =
10(1+nu)/(12+11nu) for a rectangular section).  The reference's BC/load
layout (LinearElasticity.cc:143-171: clamped x=0 wall, line load -1e-3
in z along the x=xmax, z=zmin edge, halved at corners) is exactly a
tip-loaded cantilever, so with the design solid (x=1 -> E=Emax) the FE
solution must reproduce the beam value to discretization accuracy."""

import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.config import TopOptConfig
from topopt_in_petsc_tpu.models.elasticity import LinearElasticity


def test_tip_deflection_matches_timoshenko():
    # slender solid beam: L=2.0, b=h=0.25, cube elements (1/32)^3
    cfg = TopOptConfig(
        nx=65, ny=9, nz=9, nlvls=3,
        xcmin=0.0, xcmax=2.0, ycmin=0.0, ycmax=0.25,
        zcmin=0.0, zcmax=0.25,
        dtype="float64", ksp_rtol=1e-9, ksp_maxit=400,
        operator_impl="xla",
    )
    cfg.validate()
    phys = LinearElasticity(cfg)
    x_solid = jnp.ones(phys.grid.ne, jnp.float64)
    res = phys.solve_state(x_solid)
    assert float(res.relres) < cfg.ksp_rtol

    u = np.asarray(res.x)  # (nx, ny, nz, 3)
    # FE tip deflection: mean z-displacement of the x = xmax section
    delta_fe = -float(u[-1, :, :, 2].mean())

    # Timoshenko: P from the actual RHS (corner halving included)
    P = float(np.abs(np.asarray(phys.RHS)[..., 2]).sum())
    assert P == pytest.approx(0.001 * (cfg.ny - 1), rel=1e-12)
    E, nu = cfg.Emax, cfg.nu
    L = cfg.xcmax - cfg.xcmin
    b = cfg.ycmax - cfg.ycmin
    h = cfg.zcmax - cfg.zcmin
    I = b * h**3 / 12.0
    A = b * h
    G = E / (2.0 * (1.0 + nu))
    kappa = 10.0 * (1.0 + nu) / (12.0 + 11.0 * nu)
    delta_beam = P * L**3 / (3.0 * E * I) + P * L / (kappa * G * A)

    # trilinear hexes at 8 elements through the thickness: agreement to
    # a few percent (the element is slightly stiff in bending; the edge
    # load adds local deformation beam theory ignores)
    assert delta_fe == pytest.approx(delta_beam, rel=0.06), (
        f"FE {delta_fe:.3f} vs Timoshenko {delta_beam:.3f}"
    )
