"""MMA anchored against an independent implementation (SURVEY §4(e),
VERDICT r1 #3).

`opt/mma.py` solves the MMA subproblem's dual with a dense interior-point
Newton method (the reference MMA.cc:651-946 algorithm).  Here we write a
SECOND implementation of the same published subproblem (Aage & Lazarov
2013, SMO 47(4):493-505 — the algorithm MMA.cc implements, from the
equations, not the code) in plain numpy, and solve its dual by a
completely different method: exact bisection on the concave dual gradient
(coordinate-ascent bisection for m>1).  Trajectory-level agreement over
~20 optimization iterations is the test that catches transcription errors
in either the subproblem generation or the dual solve.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.opt.mma import MMA

FEPS = 1.0e-6


class NumpyMMA:
    """Slow, clear, independent MMA: same subproblem family, different
    dual solver (bisection instead of interior-point Newton)."""

    def __init__(self, n, m, asyminit=0.5, asymdec=0.7, asyminc=1.2):
        self.n, self.m = n, m
        self.a = np.zeros(m)
        self.c = np.full(m, 1000.0)
        self.asyminit, self.asymdec, self.asyminc = (
            asyminit, asymdec, asyminc,
        )
        self.L = None
        self.U = None
        self.xo1 = None
        self.xo2 = None
        self.k = 0

    # -- subproblem generation (the GenSub equations) ---------------- #

    def _gensub(self, x, dfdx, gx, dgdx, xmin, xmax):
        if self.k < 2:
            L = x - self.asyminit * (xmax - xmin)
            U = x + self.asyminit * (xmax - xmin)
        else:
            osc = (x - self.xo1) * (self.xo1 - self.xo2)
            gamma = np.where(
                osc < 0, self.asymdec, np.where(osc > 0, self.asyminc, 1.0)
            )
            L = x - gamma * (self.xo1 - self.L)
            U = x + gamma * (self.U - self.xo1)
            xmi = np.maximum(1e-5, xmax - xmin)
            L = np.clip(L, x - 10.0 * xmi, x - 0.01 * xmi)
            U = np.clip(U, x + 0.01 * xmi, x + 10.0 * xmi)
        self.k += 1
        self.xo2, self.xo1 = self.xo1, x.copy()
        self.L, self.U = L, U

        alpha = np.maximum(xmin, 0.9 * L + 0.1 * x)
        beta = np.minimum(xmax, 0.9 * U + 0.1 * x)
        reg = 0.001 * np.abs(dfdx) + 0.5 * FEPS / (U - L)
        p0 = (U - x) ** 2 * (np.maximum(dfdx, 0.0) + reg)
        q0 = (x - L) ** 2 * (np.maximum(-dfdx, 0.0) + reg)
        pij = (U - x)[None] ** 2 * np.maximum(dgdx, 0.0)
        qij = (x - L)[None] ** 2 * np.maximum(-dgdx, 0.0)
        b = (
            np.sum(
                pij / (U - x)[None] + qij / (x - L)[None],
                axis=tuple(range(1, pij.ndim)),
            )
            - gx
        )
        return L, U, alpha, beta, p0, q0, pij, qij, b

    # -- dual solved by bisection ------------------------------------ #

    def _x_of_lam(self, lam, sub):
        L, U, alpha, beta, p0, q0, pij, qij, b = sub
        pj = p0 + np.tensordot(lam, pij, axes=1)
        qj = q0 + np.tensordot(lam, qij, axes=1)
        sp, sq = np.sqrt(pj), np.sqrt(qj)
        return np.clip((sp * L + sq * U) / (sp + sq), alpha, beta)

    def _grad_j(self, lam, j, sub):
        L, U, alpha, beta, p0, q0, pij, qij, b = sub
        x = self._x_of_lam(lam, sub)
        y = np.maximum(0.0, lam - self.c)
        z = np.maximum(0.0, 10.0 * (np.dot(lam, self.a) - 1.0))
        g = np.sum(pij[j] / (U - x) + qij[j] / (x - L))
        return g - b[j] - self.a[j] * z - y[j]

    def _solve_dual(self, sub):
        lam = np.zeros(self.m)
        sweeps = 1 if self.m == 1 else 300
        for _ in range(sweeps):
            for j in range(self.m):
                lo, v = 0.0, lam.copy()
                v[j] = 0.0
                if self._grad_j(v, j, sub) <= 0.0:
                    lam[j] = 0.0
                    continue
                hi = 1.0
                v[j] = hi
                while self._grad_j(v, j, sub) > 0.0:
                    hi *= 2.0
                    v[j] = hi
                    assert hi < 1e12, "dual gradient never crosses zero"
                for _ in range(200):
                    mid = 0.5 * (lo + hi)
                    v[j] = mid
                    if self._grad_j(v, j, sub) > 0.0:
                        lo = mid
                    else:
                        hi = mid
                lam[j] = 0.5 * (lo + hi)
        return lam

    def update(self, x, dfdx, gx, dgdx, xmin, xmax):
        sub = self._gensub(x, dfdx, gx, dgdx, xmin, xmax)
        lam = self._solve_dual(sub)
        return self._x_of_lam(lam, sub)


def _toy(shape, m, seed):
    """Compliance-like toy: f = sum w/(x+0.1) (convex, decreasing),
    volume + optional weighted-mass constraints."""
    rng = np.random.default_rng(seed)
    n = int(np.prod(shape))
    w = rng.uniform(0.5, 2.0, size=shape)
    wm = rng.uniform(0.5, 1.5, size=shape)

    def fgrad(x):
        return -w / (x + 0.1) ** 2

    def constraints(x):
        gs = [np.mean(x) - 0.4]
        dgs = [np.full(shape, 1.0 / n)]
        if m == 2:
            gs.append(float(np.sum(wm * x)) / n - 0.5)
            dgs.append(wm / n)
        return np.asarray(gs), np.stack(dgs)

    return fgrad, constraints


@pytest.mark.parametrize("m", [1, 2])
def test_trajectory_matches_independent_implementation(m):
    shape = (3, 3, 3)
    n = 27
    fgrad, constraints = _toy(shape, m, seed=m)

    ours = MMA(n, m, shape, dtype=jnp.float64)
    ref = NumpyMMA(n, m)

    x_o = np.full(shape, 0.4)
    x_r = np.full(shape, 0.4)
    hist = [x_r.copy()]
    for it in range(20):
        # both sides see THEIR OWN iterate (full trajectory coupling)
        for which in ("ours", "ref"):
            x = x_o if which == "ours" else x_r
            dfdx = fgrad(x)
            gx, dgdx = constraints(x)
            xmin = np.maximum(0.0, x - 0.2)
            xmax = np.minimum(1.0, x + 0.2)
            if which == "ours":
                x_o = np.asarray(
                    ours.update(
                        jnp.asarray(x), jnp.asarray(dfdx),
                        jnp.asarray(gx), jnp.asarray(dgdx),
                        jnp.asarray(xmin), jnp.asarray(xmax),
                    )
                )
            else:
                x_r = ref.update(x, dfdx, gx, dgdx, xmin, xmax)
        np.testing.assert_allclose(
            x_o, x_r, atol=2e-5,
            err_msg=f"trajectories diverge at iteration {it + 1}",
        )
        hist.append(x_r.copy())

    # The asymptote state feeds every later iterate, so compare it too —
    # but only where the oscillation heuristic's sign is robust: where
    # (x-xo1)(xo1-xo2) ~ 0 (elements pinned at move limits), f64
    # rounding legitimately flips gamma between 0.7/1.0/1.2 in the two
    # implementations without affecting the (clipped) iterates.
    osc = (hist[-1] - hist[-2]) * (hist[-2] - hist[-3])
    robust = np.abs(osc) > 1e-12
    if robust.any():
        np.testing.assert_allclose(
            np.asarray(ours.state.L)[robust], ref.L[robust], atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours.state.U)[robust], ref.U[robust], atol=2e-4
        )


def test_subproblem_solution_matches_bisection_exactly():
    """Single Update from identical inputs: the dual interior-point result
    must match the bisection dual optimum to interior-point tolerance."""
    shape = (4, 4, 2)
    n = 32
    rng = np.random.default_rng(9)
    x = rng.uniform(0.2, 0.8, size=shape)
    dfdx = -rng.uniform(0.5, 2.0, size=shape)
    gx = np.asarray([float(np.mean(x)) - 0.3])
    dgdx = np.full((1, *shape), 1.0 / n)
    xmin = np.maximum(0.0, x - 0.2)
    xmax = np.minimum(1.0, x + 0.2)

    ours = MMA(n, 1, shape, dtype=jnp.float64)
    x_ours = np.asarray(
        ours.update(
            jnp.asarray(x), jnp.asarray(dfdx), jnp.asarray(gx),
            jnp.asarray(dgdx), jnp.asarray(xmin), jnp.asarray(xmax),
        )
    )
    ref = NumpyMMA(n, 1)
    x_ref = ref.update(x, dfdx, gx, dgdx, xmin, xmax)
    np.testing.assert_allclose(x_ours, x_ref, atol=1e-6)
