"""Geometric multigrid preconditioner on the structured hex grid.

TPU-native replacement for the reference's PCMG stack
(LinearElasticity.cc:654-746, PDEFilter.cc:290-380):

reference (PETSc)                       | this module (JAX/TPU)
----------------------------------------|--------------------------------------
DMCoarsenHierarchy (cc:689)             | Grid.hierarchy: static 2h grids
DMCreateInterpolation (cc:704)          | separable trilinear prolong/restrict
                                        |   (strided slice ops; R = P^T)
Galerkin RAP coarse ops (cc:702)        | rediscretized coarse hex operator
                                        |   with 2x2x2-averaged element scale
GMRES(4)+SOR smoothers (cc:734-746)     | Chebyshev(4)-Jacobi (matrix-free,
                                        |   parallel, keeps V-cycle SPD)
coarse GMRES(30)+SOR (cc:717-731)       | Jacobi-PCG, rtol 1e-8, maxit 30
multiplicative V-cycle (cc:699-700)     | V-cycle, recursion unrolled in jit

Dirichlet BCs: the fine-level mask trick K <- N'KN + (I-N)
(LinearElasticity.cc:530-538) is applied at *every* level with the mask
subsampled at coarse nodes (coarse nodes coincide with fine nodes), and
restriction/prolongation are masked so corrections never touch constrained
dofs (SURVEY hard-part #5).

Everything here is jit-traceable: `setup` consumes the (traced) fine-level
element scale each outer iteration and returns per-level scale/diagonal/
eigenvalue-estimate pytrees; grids, element matrices and masks are static.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from topopt_in_petsc_tpu.ops.hex_operator import (
    apply_hex_operator,
    hex_operator_diagonal,
)
from topopt_in_petsc_tpu.solvers.cg import pcg
from topopt_in_petsc_tpu.solvers.chebyshev import (
    chebyshev_smooth,
    estimate_lambda_max,
)


# --------------------------------------------------------------------- #
# Transfer operators (DMCreateInterpolation equivalent): separable
# trilinear interpolation; restriction is its exact adjoint (R = P^T, the
# pairing PCMG's Galerkin mode uses).


def _interp_axis(u: jax.Array, axis: int) -> jax.Array:
    """Linear interpolation along one axis: size n -> 2n-1."""
    n = u.shape[axis]
    lo = jax.lax.slice_in_dim(u, 0, n - 1, axis=axis)
    hi = jax.lax.slice_in_dim(u, 1, n, axis=axis)
    mid = 0.5 * (lo + hi)
    shape = list(u.shape)
    shape[axis] = 2 * n - 1
    out = jnp.zeros(shape, u.dtype)
    even = [slice(None)] * u.ndim
    even[axis] = slice(0, None, 2)
    odd = [slice(None)] * u.ndim
    odd[axis] = slice(1, None, 2)
    out = out.at[tuple(even)].set(u)
    out = out.at[tuple(odd)].set(mid)
    return out


def prolong(uc: jax.Array) -> jax.Array:
    """Coarse (ncx,ncy,ncz,dof) -> fine (2ncx-1, ..., dof) trilinear."""
    u = uc
    for axis in range(3):
        u = _interp_axis(u, axis)
    return u


def _restrict_axis(f: jax.Array, axis: int) -> jax.Array:
    """Adjoint of _interp_axis: c[i] = f[2i] + 0.5 f[2i-1] + 0.5 f[2i+1]."""
    even = [slice(None)] * f.ndim
    even[axis] = slice(0, None, 2)
    odd = [slice(None)] * f.ndim
    odd[axis] = slice(1, None, 2)
    c = f[tuple(even)]
    mid = f[tuple(odd)]
    head = [slice(None)] * f.ndim
    head[axis] = slice(1, None)
    tail = [slice(None)] * f.ndim
    tail[axis] = slice(None, -1)
    c = c.at[tuple(head)].add(0.5 * mid)
    c = c.at[tuple(tail)].add(0.5 * mid)
    return c


def restrict(rf: jax.Array) -> jax.Array:
    """Fine -> coarse residual transfer, exact transpose of `prolong`."""
    r = rf
    for axis in range(3):
        r = _restrict_axis(r, axis)
    return r


def coarsen_cell_field(E: jax.Array) -> jax.Array:
    """2x2x2 arithmetic average of a per-element field (8-child averaging of
    the SIMP-scaled stiffness; SURVEY §7.1 'coarsen densities not
    operators')."""
    ex, ey, ez = E.shape
    return E.reshape(ex // 2, 2, ey // 2, 2, ez // 2, 2).mean(
        axis=(1, 3, 5)
    )


# --------------------------------------------------------------------- #


class GeometricMultigrid:
    """V-cycle preconditioner for the masked hex operator.

    Parameters
    ----------
    grids: fine-to-coarse Grid hierarchy (length nlvls).
    KEs:   per-level (8*dof, 8*dof) element matrices (numpy, static).
    masks: per-level (nx,ny,nz,dof) 0/1 Dirichlet masks, or None (pure
           Neumann problem, e.g. the Helmholtz filter).
    """

    def __init__(
        self,
        grids: Sequence,
        KEs: Sequence[np.ndarray],
        masks: Optional[Sequence[np.ndarray]],
        dof: int,
        *,
        dtype=jnp.float32,
        smooth_sweeps: int = 4,
        cheby_lower: float = 0.1,
        cheby_upper: float = 1.1,
        cheby_ev_iters: int = 12,
        coarse_rtol: float = 1e-8,
        coarse_maxit: int = 30,
        precise_dots: bool = True,
    ):
        self.grids = tuple(grids)
        self.nlvls = len(self.grids)
        self.dof = dof
        self.dtype = dtype
        self.KEs = [jnp.asarray(ke, dtype=dtype) for ke in KEs]
        if masks is None:
            self.masks = None
        else:
            self.masks = [jnp.asarray(m, dtype=dtype) for m in masks]
        self.smooth_sweeps = smooth_sweeps
        self.cheby_lower = cheby_lower
        self.cheby_upper = cheby_upper
        self.cheby_ev_iters = cheby_ev_iters
        self.coarse_rtol = coarse_rtol
        self.coarse_maxit = coarse_maxit
        self.precise_dots = precise_dots

    # -- per-level masked operator ------------------------------------ #

    def apply(self, level: int, scale: jax.Array, v: jax.Array) -> jax.Array:
        """A_l v = N (K_l (N v)) + (I - N) v   (LinearElasticity.cc:530-538,
        applied matrix-free at every level)."""
        if self.masks is None:
            return apply_hex_operator(v, scale, self.KEs[level])
        N = self.masks[level]
        Kv = apply_hex_operator(N * v, scale, self.KEs[level])
        return N * Kv + (1.0 - N) * v

    def _masked_diag(self, level: int, scale: jax.Array) -> jax.Array:
        nn = self.grids[level].nn
        d = hex_operator_diagonal(scale, self.KEs[level], nn)
        if self.masks is not None:
            N = self.masks[level]
            d = N * d + (1.0 - N)
        return d

    # -- setup (traced; called once per outer iteration) -------------- #

    def setup(self, scale_fine: jax.Array) -> List[dict]:
        """Build per-level {scale, dinv, lmax} from the fine element scale."""
        levels = []
        scale = scale_fine.astype(self.dtype)
        for l in range(self.nlvls):
            dinv = 1.0 / self._masked_diag(l, scale)
            A = lambda v, l=l, s=scale: self.apply(l, s, v)
            nn = self.grids[l].nn
            lmax = estimate_lambda_max(
                A,
                dinv,
                (nn[0], nn[1], nn[2], self.dof),
                self.dtype,
                iters=self.cheby_ev_iters,
            )
            levels.append({"scale": scale, "dinv": dinv, "lmax": lmax})
            if l + 1 < self.nlvls:
                scale = coarsen_cell_field(scale)
        return levels

    # -- V-cycle ------------------------------------------------------ #

    def _mask(self, level: int, v: jax.Array) -> jax.Array:
        return v if self.masks is None else self.masks[level] * v

    def vcycle(self, levels: List[dict], b: jax.Array, level: int = 0):
        """One multiplicative V(s,s) cycle; returns z ~= A^-1 b."""
        lvl = levels[level]
        scale = lvl["scale"]
        A = lambda v: self.apply(level, scale, v)

        if level == self.nlvls - 1:
            res = pcg(
                A,
                b,
                jnp.zeros_like(b),
                M=lambda r: lvl["dinv"] * r,
                rtol=self.coarse_rtol,
                maxiter=self.coarse_maxit,
                flexible=False,
                precise_dots=self.precise_dots,
            )
            return res.x

        smooth = lambda bb, xx: chebyshev_smooth(
            A,
            bb,
            xx,
            lvl["dinv"],
            lvl["lmax"],
            degree=self.smooth_sweeps,
            lower=self.cheby_lower,
            upper=self.cheby_upper,
        )

        x = smooth(b, jnp.zeros_like(b))
        r = b - A(x)
        rc = self._mask(level + 1, restrict(r))
        ec = self.vcycle(levels, rc, level + 1)
        x = x + self._mask(level, prolong(ec))
        x = smooth(b, x)
        return x

    def preconditioner(self, levels: List[dict]) -> Callable:
        return lambda r: self.vcycle(levels, r)
