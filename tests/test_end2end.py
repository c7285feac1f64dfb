"""End-to-end driver tests on a mini cantilever (SURVEY §4(h) scaled down)
+ restart roundtrip + VTU output sanity."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.config import TopOptConfig
from topopt_in_petsc_tpu.driver import Driver


def mini_cfg(tmp, **kw):
    base = dict(
        nx=17, ny=9, nz=9, nlvls=2, rmin=0.16, maxItr=5,
        dtype="float64", workdir=str(tmp), ksp_maxit=120,
    )
    base.update(kw)
    cfg = TopOptConfig(**base)
    cfg.validate()
    return cfg


def test_mini_cantilever_optimizes(tmp_path):
    cfg = mini_cfg(tmp_path)
    drv = Driver(cfg)
    hist = drv.run()
    assert len(hist["fx"]) == 5
    # compliance decreases over the first iterations (scaled design moves)
    assert hist["fx"][-1] < hist["fx"][0]
    # volume constraint approached from feasibility
    assert hist["gx"][-1] < 0.05
    # solver converged every iteration
    assert all(it < cfg.ksp_maxit for it in hist["iters"])
    # VTU written for itr<11 cadence + final
    assert os.path.exists(tmp_path / "output_00001.vtu")
    assert os.path.exists(tmp_path / "output_00006.vtu")
    # restart pair written at the final dump
    assert os.path.exists(tmp_path / "Restart00.npz") or os.path.exists(
        tmp_path / "Restart01.npz"
    )


def test_restart_roundtrip(tmp_path):
    cfg = mini_cfg(tmp_path, maxItr=10)
    drv = Driver(cfg)
    drv.run()  # writes restart at itr 10 (cadence) + final

    latest = drv.restart_mgr.latest()
    assert latest is not None

    cfg2 = mini_cfg(tmp_path, maxItr=13, restartFileVec=latest)
    drv2 = Driver(cfg2)
    assert drv2.itr == 10
    assert drv2.fscale == pytest.approx(drv.fscale)
    hist2 = drv2.run()
    assert len(hist2["fx"]) <= 3  # resumed from itr 10
    assert drv2.mma.state.k >= 10


def test_only_load_design(tmp_path):
    cfg = mini_cfg(tmp_path, maxItr=4)
    drv = Driver(cfg)
    drv.run()
    latest = drv.restart_mgr.latest()

    cfg2 = mini_cfg(
        tmp_path, maxItr=2, restartFileVec=latest, onlyLoadDesign=True
    )
    drv2 = Driver(cfg2)
    # fresh MMA + iteration counter, design loaded
    assert drv2.itr == 0
    assert drv2.mma.state.k == 0
    np.testing.assert_allclose(
        np.asarray(drv2.x), np.asarray(drv.x), rtol=1e-12
    )


def test_vtu_readable(tmp_path):
    """The .vtu must be well-formed XML with correct base64 payload sizes."""
    import base64
    import re
    import struct
    import xml.etree.ElementTree as ET

    cfg = mini_cfg(tmp_path, maxItr=1)
    drv = Driver(cfg)
    drv.run()
    path = tmp_path / "output_00001.vtu"
    tree = ET.parse(path)
    root = tree.getroot()
    piece = root.find(".//Piece")
    npoints = int(piece.get("NumberOfPoints"))
    ncells = int(piece.get("NumberOfCells"))
    assert npoints == 17 * 9 * 9
    assert ncells == 16 * 8 * 8
    names = [da.get("Name") for da in root.findall(".//DataArray")]
    for want in ["connectivity", "offsets", "types", "ux", "uy", "uz",
                 "x", "xTilde", "xPhys"]:
        assert want in names
    # check one payload: cell field length == ncells float32
    for da in root.findall(".//DataArray"):
        if da.get("Name") == "xPhys":
            txt = da.text.strip()
            header = base64.b64decode(txt[:12])  # 8 bytes -> 12 b64 chars
            (nbytes,) = struct.unpack("<Q", header)
            assert nbytes == 4 * ncells


def test_projection_filter_path(tmp_path):
    cfg = mini_cfg(
        tmp_path, maxItr=3, projectionFilter=True, beta=1.0, betaFinal=4.0
    )
    drv = Driver(cfg)
    hist = drv.run()
    assert len(hist["fx"]) == 3
    assert np.all(np.asarray(drv.xPhys) >= 0.0)
    assert np.all(np.asarray(drv.xPhys) <= 1.0)
