"""Pallas hex-operator kernel: correctness in interpreter mode (CPU).

On real TPU hardware the kernel is exercised via
`TopOptConfig(operator_impl="pallas")`; it is experimental there — the
environment's remote Mosaic compile service is flaky for large unrolled
kernels (see ops/pallas_hex.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.grid import Grid
from topopt_in_petsc_tpu.models.elements import hex8_stiffness
from topopt_in_petsc_tpu.ops.hex_operator import apply_hex_operator
from topopt_in_petsc_tpu.ops.pallas_hex import make_pallas_hex_apply


@pytest.mark.parametrize(
    "nn,tile",
    [((9, 7, 5), (4, 4)), ((17, 9, 9), (8, 8)), ((12, 12, 12), (8, 8))],
)
def test_pallas_interpret_matches_xla(nn, tile):
    grid = Grid(nn=nn, lo=(0, 0, 0), hi=(2, 1, 1))
    KE = hex8_stiffness(*grid.h, 0.3)
    rng = np.random.default_rng(0)
    E = jnp.asarray(rng.uniform(0.1, 1.0, size=grid.ne), jnp.float32)
    u = jnp.asarray(rng.normal(size=(*grid.nn, 3)), jnp.float32)
    ref = apply_hex_operator(u, E, jnp.asarray(KE, jnp.float32))
    ap = make_pallas_hex_apply(grid.nn, KE, tile=tile, interpret=True)
    got = ap(u, E)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-5


def test_pallas_split_matches():
    grid = Grid(nn=(17, 9, 9), lo=(0, 0, 0), hi=(2, 1, 1))
    KE = hex8_stiffness(*grid.h, 0.3)
    rng = np.random.default_rng(2)
    E = jnp.asarray(rng.uniform(0.1, 1.0, size=grid.ne), jnp.float32)
    u = jnp.asarray(rng.normal(size=(*grid.nn, 3)), jnp.float32)
    ref = apply_hex_operator(u, E, jnp.asarray(KE, jnp.float32))
    for split in (2, 4):
        ap = make_pallas_hex_apply(
            grid.nn, KE, tile=(8, 8), interpret=True, split=split
        )
        got = ap(u, E)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        assert err < 1e-5, f"split={split} err={err}"
