"""Octant-Galerkin coarse operator: exactness vs dense P^T K P and MG
convergence with both coarse-operator modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.config import TopOptConfig
from topopt_in_petsc_tpu.grid import Grid
from topopt_in_petsc_tpu.models.elasticity import LinearElasticity
from topopt_in_petsc_tpu.models.elements import (
    galerkin_octant_matrices,
    hex8_stiffness,
    octant_transfer_matrices,
)
from topopt_in_petsc_tpu.ops.hex_operator import (
    apply_hex_operator_octant,
    assemble_dense,
    hex_operator_diagonal_octant,
    octant_split,
)
from topopt_in_petsc_tpu.solvers.multigrid import prolong


def dense_prolongation(gc, gf):
    nc = gc.nnode * 3
    P = np.zeros((gf.nnode * 3, nc))
    for i in range(nc):
        e = np.zeros(nc)
        e[i] = 1.0
        P[:, i] = np.asarray(
            prolong(jnp.asarray(e.reshape(*gc.nn, 3)))
        ).ravel()
    return P


def test_octant_transfer_partition_of_unity():
    T = octant_transfer_matrices(3)
    # each fine corner's weights over coarse corners sum to 1 per dof
    np.testing.assert_allclose(T.sum(axis=2), 1.0)


def test_level1_galerkin_exact():
    """sum_p E_p KEp assembled == dense P^T K_h P, to machine precision."""
    gf = Grid(nn=(5, 5, 5), lo=(0, 0, 0), hi=(1, 1, 1))
    gc = gf.coarsen()
    KEf = hex8_stiffness(*gf.h, 0.3)
    rng = np.random.default_rng(0)
    E = rng.uniform(0.001, 1.0, size=gf.ne)

    Kf = assemble_dense(E, KEf, gf.nn, dof=3)
    P = dense_prolongation(gc, gf)
    K2_ref = P.T @ Kf @ P

    KEps = jnp.asarray(galerkin_octant_matrices(KEf, 3))
    octs = octant_split(jnp.asarray(E))
    nc = gc.nnode * 3
    K2 = np.zeros((nc, nc))
    for i in range(nc):
        e = np.zeros(nc)
        e[i] = 1.0
        K2[:, i] = np.asarray(
            apply_hex_operator_octant(
                jnp.asarray(e.reshape(*gc.nn, 3)), octs, KEps
            )
        ).ravel()
    np.testing.assert_allclose(K2, K2_ref, atol=1e-13 * np.abs(K2_ref).max())
    # diagonal helper agrees
    d = hex_operator_diagonal_octant(octs, KEps, gc.nn)
    np.testing.assert_allclose(
        np.asarray(d).ravel(), np.diag(K2_ref), rtol=1e-12
    )


@pytest.mark.parametrize("coarse_op", ["rediscretize", "galerkin_octant"])
def test_mg_converges_high_contrast_both_modes(coarse_op):
    cfg = TopOptConfig(
        nx=17, ny=9, nz=9, nlvls=3, dtype="float64", coarse_op=coarse_op,
    )
    cfg.validate()
    phys = LinearElasticity(cfg)
    rng = np.random.default_rng(9)
    x = np.where(rng.uniform(size=phys.grid.ne) > 0.5, 1.0, 0.001)
    res = phys.solve_state(jnp.asarray(x))
    assert float(res.relres) <= cfg.ksp_rtol * 1.01
    assert int(res.iters) <= 100
