"""Chebyshev polynomial smoother with Jacobi (diagonal) scaling.

The reference smooths each multigrid level with GMRES(4)+SOR
(LinearElasticity.cc:734-746) and its own comments recommend Chebyshev for
SPD problems (cc:739-745).  SOR is inherently sequential (forward sweeps over
rows) and a poor fit for the TPU's vector units; Chebyshev-Jacobi is the
standard TPU/GPU-friendly smoother: it is matrix-free (only needs K@v and
diag(K)), embarrassingly parallel, and — unlike GMRES/SOR — a *fixed linear
operator*, which keeps the V-cycle a symmetric positive definite
preconditioner so plain CG stays valid on the outside.

Smoothing band: [cheby_lower * lmax, cheby_upper * lmax] with lmax estimated
by a short power iteration on D^-1 K (PETSc's ksp_chebyshev_esteig plays the
same role).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def estimate_lambda_max(
    A: Callable[[jax.Array], jax.Array],
    dinv: jax.Array,
    shape: tuple,
    dtype,
    iters: int = 12,
    safety: float = 1.05,
) -> jax.Array:
    """Largest eigenvalue of D^-1 A by power iteration.

    Uses the D-inner-product Rayleigh quotient (v.Av)/(v.Dv), which is the
    Rayleigh quotient of the symmetric pencil (A, D), so the estimate is a
    lower bound converging from below; `safety` compensates.
    """
    key = jax.random.PRNGKey(17)
    v = jax.random.uniform(key, shape, dtype=dtype, minval=0.5, maxval=1.0)

    def body(_, v):
        w = dinv * A(v)
        return w / jnp.linalg.norm(w.ravel())

    v = jax.lax.fori_loop(0, iters, body, v)
    Av = A(v)
    num = jnp.vdot(v.ravel(), Av.ravel())
    den = jnp.vdot(v.ravel(), (v / dinv).ravel())
    return safety * num / den


def chebyshev_smooth(
    A: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x: jax.Array,
    dinv: jax.Array,
    lmax: jax.Array,
    *,
    degree: int = 4,
    lower: float = 0.1,
    upper: float = 1.1,
) -> jax.Array:
    """`degree` Chebyshev iterations targeting D^-1 A in [lower, upper]*lmax.

    Classical three-term recurrence (Saad, Iterative Methods §12.3 /
    hypre-style), maintaining the true residual.  A fixed polynomial in
    (D^-1 A) applied to the residual: linear, SPD-compatible.
    """
    lmin = lower * lmax
    lmax_b = upper * lmax
    theta = 0.5 * (lmax_b + lmin)
    delta = 0.5 * (lmax_b - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma

    r = b - A(x)
    d = (dinv * r) / theta
    x = x + d

    def body(_, carry):
        x, r, d, rho = carry
        r = r - A(d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (dinv * r)
        x = x + d
        return (x, r, d, rho_new)

    x, _, _, _ = jax.lax.fori_loop(0, degree - 1, body, (x, r, d, rho))
    return x
