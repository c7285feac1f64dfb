"""SPMD driver: mini cantilever over a (2,2,2) CPU device mesh, compared
against the single-device Driver trajectory."""

import jax
import numpy as np
import pytest

from topopt_in_petsc_tpu.config import TopOptConfig
from topopt_in_petsc_tpu.driver import Driver, run_topopt

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_spmd_driver_matches_single_device(tmp_path):
    common = dict(
        nx=17, ny=9, nz=9, nlvls=2, rmin=0.16, maxItr=4,
        dtype="float64", output_cadence_vtu=False, restart=False,
    )
    cfg1 = TopOptConfig(workdir=str(tmp_path / "a"), **common)
    cfg1.validate()
    h1 = Driver(cfg1).run()

    cfg2 = TopOptConfig(
        workdir=str(tmp_path / "b"), mesh_shape=(2, 2, 2), **common
    )
    cfg2.validate()
    h2 = run_topopt(cfg2)

    assert len(h2["fx"]) == len(h1["fx"])
    # same math (f64): trajectories should agree closely
    np.testing.assert_allclose(h2["fx"], h1["fx"], rtol=1e-5)
    np.testing.assert_allclose(h2["gx"], h1["gx"], atol=1e-7)
    np.testing.assert_allclose(h2["ch"], h1["ch"], atol=1e-6)


def test_spmd_driver_restart(tmp_path):
    cfg = TopOptConfig(
        nx=17, ny=9, nz=9, nlvls=2, rmin=0.16, maxItr=10,
        dtype="float64", workdir=str(tmp_path),
        mesh_shape=(2, 2, 2), output_cadence_vtu=False,
    )
    cfg.validate()
    from topopt_in_petsc_tpu.parallel.spmd_driver import SpmdDriver

    d = SpmdDriver(cfg)
    d.run()
    latest = d.restart_mgr.latest()
    assert latest is not None

    cfg2 = TopOptConfig(
        nx=17, ny=9, nz=9, nlvls=2, rmin=0.16, maxItr=12,
        dtype="float64", workdir=str(tmp_path),
        mesh_shape=(2, 2, 2), output_cadence_vtu=False,
        restartFileVec=latest,
    )
    cfg2.validate()
    d2 = SpmdDriver(cfg2)
    assert d2.itr == 10
    h = d2.run()
    assert len(h["fx"]) <= 2


def test_spmd_driver_pde_filter_matches_single_device(tmp_path):
    """Helmholtz PDE filter (type 2) fused into the SPMD step vs the
    single-device Driver trajectory."""
    common = dict(
        nx=17, ny=9, nz=9, nlvls=2, rmin=0.16, maxItr=3, filter=2,
        dtype="float64", output_cadence_vtu=False, restart=False,
    )
    cfg1 = TopOptConfig(workdir=str(tmp_path / "a"), **common)
    cfg1.validate()
    h1 = Driver(cfg1).run()

    cfg2 = TopOptConfig(
        workdir=str(tmp_path / "b"), mesh_shape=(2, 2, 2), **common
    )
    cfg2.validate()
    h2 = run_topopt(cfg2)

    assert len(h2["fx"]) == len(h1["fx"])
    np.testing.assert_allclose(h2["fx"], h1["fx"], rtol=1e-5)
    np.testing.assert_allclose(h2["gx"], h1["gx"], atol=1e-7)
    np.testing.assert_allclose(h2["ch"], h1["ch"], atol=1e-6)


def test_spmd_driver_projection(tmp_path):
    """Projection + beta continuation through the SPMD driver."""
    from topopt_in_petsc_tpu.parallel.spmd_driver import SpmdDriver

    cfg = TopOptConfig(
        nx=17, ny=9, nz=9, nlvls=2, rmin=0.16, maxItr=3,
        dtype="float64", workdir=str(tmp_path), mesh_shape=(2, 2, 2),
        output_cadence_vtu=False, projectionFilter=True, beta=1.0,
        betaFinal=4.0,
    )
    cfg.validate()
    h = SpmdDriver(cfg).run()
    assert len(h["fx"]) == 3
    assert all(np.isfinite(v) for v in h["fx"])


def test_spmd_driver_output_dat(tmp_path):
    """`-fused 1 -output_dat 1` must produce a reference-format .dat
    decodable by the offline tools (MPIIO.cc:147-205 parity on the
    PARALLEL path; VERDICT r1 #5)."""
    import os

    from topopt_in_petsc_tpu.io.mpiio_dat import dat_to_vtu, read_dat
    from topopt_in_petsc_tpu.parallel.spmd_driver import SpmdDriver

    cfg = TopOptConfig(
        nx=17, ny=9, nz=9, nlvls=2, rmin=0.16, maxItr=2,
        dtype="float64", workdir=str(tmp_path), mesh_shape=(2, 2, 2),
        output_cadence_vtu=False, output_dat=True, restart=False,
    )
    cfg.validate()
    d = SpmdDriver(cfg)
    h = d.run()
    path = str(tmp_path / "output_00000.dat")
    assert os.path.exists(path)
    dat = read_dat(path)
    # itr 1, 2 (cadence itr < 11) + final dump
    assert [s["itr"] for s in dat["steps"]] == [1, 2, 3]
    assert dat["points"].shape == (17 * 9 * 9, 3)
    step = dat["steps"][-1]
    xphys = step["cell_fields"]["xPhys"]
    assert xphys.shape == (16 * 8 * 8,)
    # volume constraint ~ volfrac
    assert abs(float(xphys.mean()) - cfg.volfrac) < 0.05
    # gathered xPhys must equal the .dat field (same dump)
    xg = d._gather_elem(d.state.xPhys).ravel()
    np.testing.assert_allclose(xphys, xg.astype(np.float32), atol=1e-6)
    # offline conversion runs
    out = dat_to_vtu(path, str(tmp_path / "conv"), dataset=2)
    assert os.path.exists(out)
