"""Element-matrix tests: independent verification of the Hex8 stiffness and
Helmholtz filter matrices (the reference ships zero tests; SURVEY §4(a))."""

import numpy as np
import pytest

from topopt_in_petsc_tpu.grid import CORNER_OFFSETS
from topopt_in_petsc_tpu.models.elements import (
    helmholtz_element_matrices,
    hex8_laplace_mass,
    hex8_stiffness,
    isotropic_C,
    shape_functions,
)

DX, DY, DZ, NU = 0.03125, 0.030303, 0.029412, 0.3


def corner_coords(dx, dy, dz):
    return np.array(CORNER_OFFSETS, dtype=float) * [dx, dy, dz]


class TestHex8Stiffness:
    def test_symmetry(self):
        ke = hex8_stiffness(DX, DY, DZ, NU)
        np.testing.assert_allclose(ke, ke.T, atol=1e-14)

    def test_rigid_body_modes(self):
        """KE annihilates 3 translations + 3 infinitesimal rotations."""
        ke = hex8_stiffness(DX, DY, DZ, NU)
        X = corner_coords(DX, DY, DZ)
        modes = []
        for d in range(3):
            t = np.zeros((8, 3))
            t[:, d] = 1.0
            modes.append(t.ravel())
        for a, b in [(0, 1), (1, 2), (0, 2)]:
            r = np.zeros((8, 3))
            r[:, a] = X[:, b]
            r[:, b] = -X[:, a]
            modes.append(r.ravel())
        for m in modes:
            assert np.abs(ke @ m).max() < 1e-12 * np.abs(ke).max()

    def test_psd_rank(self):
        ke = hex8_stiffness(DX, DY, DZ, NU)
        w = np.linalg.eigvalsh(ke)
        assert w[0] > -1e-14
        # exactly 6 zero modes
        assert np.sum(np.abs(w) < 1e-12 * w[-1]) == 6

    def test_patch_uniform_strain(self):
        """Energy of a uniform-strain field equals vol * eps^T C eps."""
        rng = np.random.default_rng(0)
        ke = hex8_stiffness(DX, DY, DZ, NU)
        X = corner_coords(DX, DY, DZ)
        A = rng.normal(size=(3, 3))
        u = (X @ A.T).ravel()  # u_i = A @ x
        # engineering strains of the linear field
        eps = np.array(
            [
                A[0, 0],
                A[1, 1],
                A[2, 2],
                A[0, 1] + A[1, 0],
                A[1, 2] + A[2, 1],
                A[0, 2] + A[2, 0],
            ]
        )
        C = isotropic_C(NU)
        vol = DX * DY * DZ
        np.testing.assert_allclose(u @ ke @ u, vol * eps @ C @ eps, rtol=1e-12)

    def test_reference_unit_cube_value(self):
        """Known closed-form diagonal entry for unit cube, nu=0.3.

        For the unit cube Q1 element, KE[0,0] = (lam+2mu)/9 + ... ; instead
        of a brittle constant we check the trace identity
        tr(KE) = 8 * sum_gp w * sum_d (C_dd * g_d^2 ...) via an independent
        quadrature over shape-gradient squares.
        """
        ke = hex8_stiffness(1.0, 1.0, 1.0, 0.3)
        K, M = hex8_laplace_mass(1.0, 1.0, 1.0)
        lam = 0.3 / (1.3 * 0.4)
        mu = 1.0 / 2.6
        # tr(KE) = sum_nodes sum_d \int (lam+2mu) (dN/dx_d)^2
        #          + mu[(dN/dx_a)^2 + (dN/dx_b)^2]  for the two shear rows
        # = (lam+2mu) tr(K) + 2 mu tr(K)
        np.testing.assert_allclose(
            np.trace(ke), (lam + 2 * mu + 2 * mu) * np.trace(K), rtol=1e-12
        )


class TestHelmholtz:
    def test_kron_structure(self):
        """Laplace/mass via independent 1D kron construction."""
        K, M = hex8_laplace_mass(DX, DY, DZ)

        def m1(h):
            return h / 6.0 * np.array([[2.0, 1.0], [1.0, 2.0]])

        def k1(h):
            return 1.0 / h * np.array([[1.0, -1.0], [-1.0, 1.0]])

        # kron in (x,y,z) with binary node order (iz iy ix)? Build map from
        # corner offsets to tensor index ox + 2*oy + 4*oz.
        perm = [ox + 2 * oy + 4 * oz for (ox, oy, oz) in
                [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                 (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]]
        Mk = np.kron(m1(DZ), np.kron(m1(DY), m1(DX)))
        Kk = (
            np.kron(m1(DZ), np.kron(m1(DY), k1(DX)))
            + np.kron(m1(DZ), np.kron(k1(DY), m1(DX)))
            + np.kron(k1(DZ), np.kron(m1(DY), m1(DX)))
        )
        P = np.zeros((8, 8))
        for a, p in enumerate(perm):
            P[a, p] = 1.0
        np.testing.assert_allclose(M, P @ Mk @ P.T, rtol=1e-12)
        np.testing.assert_allclose(K, P @ Kk @ P.T, rtol=1e-12)

    def test_partition_of_unity(self):
        N = shape_functions(np.array([[0.3, -0.2, 0.77]]))
        np.testing.assert_allclose(N.sum(), 1.0, rtol=1e-14)

    def test_helmholtz_composition(self):
        R = 0.08 / (2.0 * np.sqrt(3.0))
        KF, TF = helmholtz_element_matrices(DX, DY, DZ, R)
        K, M = hex8_laplace_mass(DX, DY, DZ)
        np.testing.assert_allclose(KF, R * R * K + M, rtol=1e-14)
        np.testing.assert_allclose(TF, np.full(8, 0.125))

    def test_mass_row_sum(self):
        """Row sums of M = integral of N_i = vol/8."""
        _, M = hex8_laplace_mass(DX, DY, DZ)
        np.testing.assert_allclose(
            M.sum(axis=1), DX * DY * DZ / 8.0, rtol=1e-12
        )
