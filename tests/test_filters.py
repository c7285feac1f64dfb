"""Filter tests (SURVEY §4(d)): convolution filter vs direct dense H-matrix
application, projection chain rules vs finite differences, PDE filter
properties."""

import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.config import TopOptConfig
from topopt_in_petsc_tpu.grid import Grid
from topopt_in_petsc_tpu.opt.filters import (
    DesignFilter,
    build_filter_kernel,
    filter_stencil_halfwidth,
    smooth_projection,
    smooth_projection_chainrule,
)


def dense_H(grid, R):
    """Direct O(n^2) H-matrix construction (Filter.cc:404-440 semantics)."""
    C = grid.elem_center_coords().reshape(-1, 3)
    D = np.linalg.norm(C[:, None, :] - C[None, :, :], axis=-1)
    H = np.where(D < R, R - D, 0.0)
    return H


@pytest.fixture(scope="module")
def small_cfg():
    cfg = TopOptConfig(
        nx=9, ny=7, nz=5, nlvls=1, rmin=0.25, dtype="float64"
    )
    cfg.validate()
    return cfg


class TestDensityFilter:
    def test_conv_matches_dense_H(self, small_cfg):
        cfg = small_cfg
        grid = Grid.from_config(cfg)
        filt = DesignFilter(cfg, grid)
        rng = np.random.default_rng(0)
        x = rng.uniform(size=grid.ne)

        H = dense_H(grid, cfg.rmin)
        Hs = H.sum(axis=1)
        expected = (H @ x.ravel()) / Hs

        xTilde, xPhys = filt.filter_project(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(xTilde).ravel(), expected, rtol=1e-10
        )
        np.testing.assert_allclose(np.asarray(xPhys), np.asarray(xTilde))

    def test_filter_preserves_constants(self, small_cfg):
        grid = Grid.from_config(small_cfg)
        filt = DesignFilter(small_cfg, grid)
        x = jnp.full(grid.ne, 0.37)
        xTilde, _ = filt.filter_project(x)
        np.testing.assert_allclose(np.asarray(xTilde), 0.37, rtol=1e-12)

    def test_gradient_chainrule_vs_fd(self, small_cfg):
        """d(sum f(xTilde))/dx via chain rule == finite differences."""
        cfg = small_cfg
        grid = Grid.from_config(cfg)
        filt = DesignFilter(cfg, grid)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0.2, 0.8, size=grid.ne))
        w = jnp.asarray(rng.normal(size=grid.ne))  # d f / d xTilde

        # chain rule (density filter): df/dx = H^T (w / Hs) == conv(w/Hs)
        df, _ = filt.gradients(
            x, x, w, jnp.zeros((1, *grid.ne)), projection=False
        )

        def F(xv):
            xt, _ = filt.filter_project(xv)
            return float(jnp.vdot(w, xt))

        eps = 1e-6
        for idx in [(0, 0, 0), (3, 2, 1), (7, 5, 3)]:
            e = jnp.zeros(grid.ne).at[idx].set(eps)
            fd = (F(x + e) - F(x - e)) / (2 * eps)
            assert abs(fd - float(df[idx])) < 1e-5 * max(1.0, abs(fd))

    def test_sensitivity_filter(self, small_cfg):
        """Type 0: dfdx <- (H (dfdx o x)) / Hs / x (Filter.cc:167-177)."""
        import dataclasses

        cfg = dataclasses.replace(small_cfg, filter=0)
        cfg.validate()
        assert cfg.Xmin == 0.001
        grid = Grid.from_config(cfg)
        filt = DesignFilter(cfg, grid)
        rng = np.random.default_rng(2)
        x = rng.uniform(0.1, 1.0, size=grid.ne)
        df = rng.normal(size=grid.ne)

        H = dense_H(grid, cfg.rmin)
        Hs = H.sum(axis=1)
        expected = (H @ (df * x).ravel()) / Hs / x.ravel()

        # type 0 passes x through unchanged in filter_project
        xT, xP = filt.filter_project(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(xT), x)

        got, _ = filt.gradients(
            jnp.asarray(x), xT, jnp.asarray(df),
            jnp.zeros((1, *grid.ne)), projection=False,
        )
        np.testing.assert_allclose(
            np.asarray(got).ravel(), expected, rtol=1e-9
        )

    def test_stencil_halfwidth(self):
        # rmin=0.08, dx=2/64=0.03125 -> ceil(2.56)-1 = 2 (Filter.cc:326)
        s = filter_stencil_halfwidth(
            0.08, (0.03125, 0.03125, 0.03125), (65, 33, 33)
        )
        assert s == 2


class TestProjection:
    def test_heaviside_limits(self):
        x = jnp.linspace(0.0, 1.0, 11)
        y = smooth_projection(x, 64.0, 0.5)
        assert float(y[0]) < 1e-6 and float(y[-1]) > 1 - 1e-6
        # monotone
        assert np.all(np.diff(np.asarray(y)) >= 0)

    def test_chainrule_vs_fd(self):
        x = jnp.asarray([0.2, 0.5, 0.77])
        beta, eta = 8.0, 0.3
        eps = 1e-6
        fd = (
            smooth_projection(x + eps, beta, eta)
            - smooth_projection(x - eps, beta, eta)
        ) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(smooth_projection_chainrule(x, beta, eta)),
            np.asarray(fd),
            rtol=1e-5,
        )

    def test_identity_at_beta_zero_limit(self):
        """beta -> 0: projection approaches identity-ish mapping through
        (eta)."""
        x = jnp.linspace(0.01, 0.99, 9)
        y = smooth_projection(x, 1e-4, 0.5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


class TestBetaContinuation:
    def test_increase_rules(self):
        # trigger: ch < 0.01, feasible, beta < betaFinal
        b, ch = DesignFilter.increase_beta(1.0, 48.0, -0.1, 7, 0.005)
        assert b == 2.0 and ch
        # multiplicative branch above 7
        b, ch = DesignFilter.increase_beta(8.0, 48.0, -0.1, 7, 0.005)
        assert abs(b - 9.6) < 1e-12 and ch
        # cap at betaFinal -> changed False
        b, ch = DesignFilter.increase_beta(47.0, 48.0, -0.1, 7, 0.005)
        assert b == 48.0 and not ch
        # no trigger when infeasible
        b, ch = DesignFilter.increase_beta(1.0, 48.0, 0.5, 7, 0.005)
        assert b == 1.0 and not ch
        # no trigger when ch large and itr not %10
        b, ch = DesignFilter.increase_beta(1.0, 48.0, -0.1, 7, 0.5)
        assert b == 1.0 and not ch
        # itr % 10 == 0 triggers even with large ch
        b, ch = DesignFilter.increase_beta(1.0, 48.0, -0.1, 10, 0.5)
        assert b == 2.0 and ch


class TestMND:
    def test_values(self, small_cfg):
        grid = Grid.from_config(small_cfg)
        filt = DesignFilter(small_cfg, grid)
        assert abs(filt.get_mnd(jnp.full(grid.ne, 0.5)) - 1.0) < 1e-12
        assert filt.get_mnd(jnp.ones(grid.ne)) < 1e-12
        assert filt.get_mnd(jnp.zeros(grid.ne)) < 1e-12


class TestPDEFilter:
    @pytest.fixture(scope="class")
    def pde_setup(self):
        cfg = TopOptConfig(
            nx=9, ny=9, nz=9, nlvls=1, rmin=0.3, filter=2,
            pde_nlvls=2, dtype="float64",
            xcmax=1.0, ycmax=1.0, zcmax=1.0,
        )
        cfg.validate()
        grid = Grid.from_config(cfg)
        filt = DesignFilter(cfg, grid)
        return cfg, grid, filt

    def test_preserves_constants(self, pde_setup):
        """Helmholtz filter of a constant field is that constant:
        (-R^2 lap + I) c = c with natural BCs, and T^T T-average = c."""
        cfg, grid, filt = pde_setup
        x = jnp.full(grid.ne, 0.42)
        xTilde, xPhys = filt.filter_project(x)
        np.testing.assert_allclose(np.asarray(xTilde), 0.42, atol=1e-7)

    def test_self_adjoint(self, pde_setup):
        """<F(a), b> == <a, F(b)> — Gradients == FilterProject
        (PDEFilter.cc:218)."""
        cfg, grid, filt = pde_setup
        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.uniform(size=grid.ne))
        b = jnp.asarray(rng.uniform(size=grid.ne))
        Fa = filt.pdef.filter_project(a)
        Fb = filt.pdef.filter_project(b)
        lhs = float(jnp.vdot(Fa, b))
        rhs = float(jnp.vdot(a, Fb))
        assert abs(lhs - rhs) < 1e-7 * abs(lhs)

    def test_smoothing(self, pde_setup):
        """Filtered random noise has much lower high-frequency content."""
        cfg, grid, filt = pde_setup
        rng = np.random.default_rng(6)
        x = rng.uniform(size=grid.ne)
        xTilde, _ = filt.filter_project(jnp.asarray(x))
        xt = np.asarray(xTilde)
        # variance shrinks under smoothing
        assert xt.var() < 0.25 * x.var()
        # mean approximately preserved (mass conservation of Helmholtz)
        assert abs(xt.mean() - x.mean()) < 5e-3


class TestFFTConvBackend:
    def test_fft_matches_direct(self):
        """FFT conv backend == direct conv (and == dense H) with a large
        stencil."""
        from topopt_in_petsc_tpu.ops.conv_filter import (
            conv3d_direct,
            make_fft_conv,
        )
        from topopt_in_petsc_tpu.opt.filters import build_filter_kernel

        rng = np.random.default_rng(0)
        shape = (16, 12, 10)
        h = (0.05, 0.05, 0.05)
        R = 0.26  # halfwidth 5 -> 11^3 taps
        from topopt_in_petsc_tpu.opt.filters import (
            filter_stencil_halfwidth,
        )

        s = filter_stencil_halfwidth(R, h, tuple(n + 1 for n in shape))
        k = build_filter_kernel(R, h, s)
        x = jnp.asarray(rng.uniform(size=shape))
        direct = conv3d_direct(x, jnp.asarray(k))
        conv = make_fft_conv(shape, k, jnp.float64)
        fft = conv(x, conv.consts)
        np.testing.assert_allclose(
            np.asarray(fft), np.asarray(direct), rtol=1e-10, atol=1e-12
        )

    def test_fft_valid_mode(self):
        """crop_offset=s: VALID conv on a pre-ghosted block."""
        from topopt_in_petsc_tpu.ops.conv_filter import (
            conv3d_direct,
            make_fft_conv,
        )
        from topopt_in_petsc_tpu.opt.filters import build_filter_kernel

        rng = np.random.default_rng(1)
        s = 2
        k = build_filter_kernel(0.16, (0.0625,) * 3, s)
        inner = (8, 8, 8)
        x = rng.uniform(size=inner)
        xpad = np.pad(x, s)  # ghosted with zeros
        ref = conv3d_direct(jnp.asarray(x), jnp.asarray(k))  # SAME/zero
        conv = make_fft_conv(
            tuple(n + 2 * s for n in inner), k, jnp.float64,
            crop_offset=s,
        )
        got = conv(jnp.asarray(xpad), conv.consts)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-10, atol=1e-12
        )
