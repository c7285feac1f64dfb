"""SPMD PDE filter vs single-device PDE filter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.config import TopOptConfig
from topopt_in_petsc_tpu.grid import Grid
from topopt_in_petsc_tpu.opt.pde_filter import PDEFilter
from topopt_in_petsc_tpu.parallel.decomp import BlockDecomp
from topopt_in_petsc_tpu.parallel.mesh import make_device_mesh
from topopt_in_petsc_tpu.parallel.spmd_pde_filter import SpmdPDEFilter

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_spmd_pde_filter_matches_single_device():
    cfg = TopOptConfig(
        nx=17, ny=9, nz=9, nlvls=2, rmin=0.3, filter=2, pde_nlvls=2,
        dtype="float64",
    )
    cfg.validate()
    grid = Grid.from_config(cfg)

    pdef = PDEFilter(cfg, grid)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=grid.ne)
    ref = np.asarray(pdef.filter_project(jnp.asarray(x)))

    mesh = make_device_mesh((2, 2, 2))
    decomp = BlockDecomp(grid, (2, 2, 2), nlvls=cfg.nlvls)
    spdef = SpmdPDEFilter(cfg, decomp, mesh)
    x_blk = jax.device_put(
        decomp.to_blocked_elem(x[..., None])[..., 0],
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("x", "y", "z")
        ),
    )
    got_blk = spdef.filter_project(x_blk)
    got = decomp.from_blocked_elem(np.asarray(got_blk)[..., None])[..., 0]
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)
