"""MMA tests (SURVEY §4(e)): verify the dual interior-point subproblem
solver against analytically-solvable problems and KKT conditions."""

import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.opt.mma import MMA


def test_volume_constrained_linear_objective():
    """min  sum(c_i x_i)  s.t.  mean(x) <= V,  0 <= x <= 1.

    With all c_i < 0 and distinct, the optimum fills the volume budget with
    the most negative-gradient entries; MMA must drive toward that and
    satisfy the constraint at the subproblem solution.
    """
    rng = np.random.default_rng(0)
    n = 64
    shape = (4, 4, 4)
    cvec = -rng.uniform(1.0, 2.0, size=shape)
    V = 0.3

    mma = MMA(n, 1, shape, dtype=jnp.float64)
    x = jnp.full(shape, V)
    for it in range(120):
        dfdx = jnp.asarray(cvec)
        gx = jnp.asarray([float(jnp.mean(x)) - V])
        dgdx = jnp.full((1, *shape), 1.0 / n)
        xmin, xmax = mma.set_outer_movelimit(0.0, 1.0, 0.2, x)
        x = mma.update(x, dfdx, gx, dgdx, xmin, xmax)
    # constraint satisfied (to interior-point tolerance)
    assert float(jnp.mean(x)) <= V + 1e-3
    # the budget is used (active constraint since objective decreasing in x)
    assert float(jnp.mean(x)) >= V - 1e-3
    # top-|c| entries end high, bottom end low (MMA converges linearly,
    # so allow slack around the activation threshold)
    xs = np.asarray(x).ravel()
    order = np.argsort(cvec.ravel())  # most negative first
    k = int(np.floor(V * n))
    assert xs[order[: k - 2]].min() > 0.8
    assert xs[order[k + 3:]].max() < 0.2


def test_separable_quadratic_unconstrained_interior():
    """min sum (x_i - t_i)^2 with inactive constraint: MMA fixed point is
    x = t (interior stationary point)."""
    rng = np.random.default_rng(3)
    shape = (3, 3, 3)
    n = 27
    t = rng.uniform(0.3, 0.7, size=shape)

    mma = MMA(n, 1, shape, dtype=jnp.float64)
    x = jnp.full(shape, 0.5)
    for it in range(60):
        dfdx = 2.0 * (x - t)
        gx = jnp.asarray([float(jnp.mean(x)) - 10.0])  # never active
        dgdx = jnp.full((1, *shape), 1.0 / n)
        xmin, xmax = mma.set_outer_movelimit(0.0, 1.0, 0.5, x)
        x = mma.update(x, dfdx, gx, dgdx, xmin, xmax)
    # MMA plateaus at the scale of its subproblem regularization
    # (0.001|df| + feps terms); 1e-2 matches the reference's behavior.
    np.testing.assert_allclose(np.asarray(x), t, atol=1e-2)


def test_design_change_and_movelimits():
    shape = (2, 2, 2)
    mma = MMA(8, 1, shape, dtype=jnp.float64)
    x = jnp.full(shape, 0.5)
    xmin, xmax = mma.set_outer_movelimit(0.0, 1.0, 0.2, x)
    np.testing.assert_allclose(np.asarray(xmin), 0.3)
    np.testing.assert_allclose(np.asarray(xmax), 0.7)
    x2 = x.at[0, 0, 0].add(0.13)
    ch, _ = mma.design_change(x2, x)
    assert abs(ch - 0.13) < 1e-12


def test_two_constraints():
    """m=2: volume + an upper bound on a weighted sum; solver must return
    feasible x for both."""
    rng = np.random.default_rng(5)
    shape = (4, 4, 4)
    n = 64
    w = rng.uniform(0.5, 1.5, size=shape)
    mma = MMA(n, 2, shape, dtype=jnp.float64)
    x = jnp.full(shape, 0.4)
    for it in range(20):
        dfdx = -jnp.ones(shape)
        g1 = float(jnp.mean(x)) - 0.4
        g2 = float(jnp.sum(jnp.asarray(w) * x)) / n - 0.45
        gx = jnp.asarray([g1, g2])
        dgdx = jnp.stack(
            [jnp.full(shape, 1.0 / n), jnp.asarray(w) / n]
        )
        xmin, xmax = mma.set_outer_movelimit(0.0, 1.0, 0.2, x)
        x = mma.update(x, dfdx, gx, dgdx, xmin, xmax)
    assert float(jnp.mean(x)) <= 0.4 + 1e-3
    assert float(jnp.sum(jnp.asarray(w) * x)) / n <= 0.45 + 1e-3


def test_restart_roundtrip():
    shape = (2, 2, 2)
    mma = MMA(8, 1, shape, dtype=jnp.float64)
    x = jnp.full(shape, 0.5)
    for it in range(4):
        dfdx = -jnp.ones(shape)
        gx = jnp.asarray([float(jnp.mean(x)) - 0.5])
        dgdx = jnp.full((1, *shape), 1.0 / 8)
        xmin, xmax = mma.set_outer_movelimit(0.0, 1.0, 0.2, x)
        x = mma.update(x, dfdx, gx, dgdx, xmin, xmax)
    xo1, xo2, U, L = mma.restart_vectors()
    mma2 = MMA.from_restart(
        8, 1, shape, jnp.float64, mma.state.k, xo1, xo2, U, L
    )
    assert mma2.state.k == 4
    np.testing.assert_allclose(np.asarray(mma2.state.U), np.asarray(U))
