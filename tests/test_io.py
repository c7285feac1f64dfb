"""I/O tests: reference-format .dat roundtrip + offline converter."""

import numpy as np
import pytest

from topopt_in_petsc_tpu.grid import Grid
from topopt_in_petsc_tpu.io.mpiio_dat import MPIIODat, dat_to_vtu, read_dat


def test_dat_roundtrip(tmp_path):
    grid = Grid(nn=(5, 4, 3), lo=(0, 0, 0), hi=(1, 0.7, 0.5))
    path = str(tmp_path / "output_00000.dat")
    dat = MPIIODat(path, grid)
    rng = np.random.default_rng(0)
    u = [rng.normal(size=grid.nn).astype(np.float32) for _ in range(3)]
    c = [rng.uniform(size=grid.ne).astype(np.float32) for _ in range(3)]
    dat.write_fields(1, u, c)
    dat.write_fields(2, [f + 1 for f in u], c)

    d = read_dat(path)
    assert d["points"].shape == (grid.nnode, 3)
    assert d["conn"].shape == (grid.nelem, 8)
    assert (d["types"] == 12).all()
    assert len(d["steps"]) == 2
    np.testing.assert_allclose(
        d["steps"][0]["point_fields"]["ux"], u[0].ravel()
    )
    np.testing.assert_allclose(
        d["steps"][1]["point_fields"]["ux"], (u[0] + 1).ravel()
    )
    np.testing.assert_allclose(
        d["steps"][0]["cell_fields"]["xPhys"], c[2].ravel()
    )
    # connectivity indices consistent with the point count
    assert d["conn"].max() == grid.nnode - 1
    # header matches the reference field-name contract (main.cc:40)


def test_dat_to_vtu(tmp_path):
    import base64
    import struct
    import xml.etree.ElementTree as ET

    grid = Grid(nn=(4, 4, 4))
    path = str(tmp_path / "output_00000.dat")
    dat = MPIIODat(path, grid)
    rng = np.random.default_rng(1)
    dat.write_fields(
        7,
        [rng.normal(size=grid.nn).astype(np.float32) for _ in range(3)],
        [rng.uniform(size=grid.ne).astype(np.float32) for _ in range(3)],
    )
    import os

    os.chdir(tmp_path)
    out = dat_to_vtu(path, str(tmp_path / "decoded"), 0)
    tree = ET.parse(out)
    piece = tree.getroot().find(".//Piece")
    assert int(piece.get("NumberOfPoints")) == grid.nnode
    assert int(piece.get("NumberOfCells")) == grid.nelem
    names = [da.get("Name") for da in tree.getroot().findall(".//DataArray")]
    for want in ("ux", "uy", "uz", "x", "xTilde", "xPhys"):
        assert want in names


def test_driver_writes_dat(tmp_path):
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.driver import Driver

    cfg = TopOptConfig(
        nx=9, ny=5, nz=5, nlvls=2, rmin=0.3, maxItr=2,
        dtype="float64", workdir=str(tmp_path), output_dat=True,
        output_cadence_vtu=False,
    )
    cfg.validate()
    Driver(cfg).run()
    d = read_dat(str(tmp_path / "output_00000.dat"))
    assert len(d["steps"]) >= 2
