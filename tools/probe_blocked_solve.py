"""TPU probe: blocked-resident MG-PCG solve vs the round-1 pallas path.

Usage: python tools/probe_blocked_solve.py <nelem_axis> [impl...]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from topopt_in_petsc_tpu.config import TopOptConfig  # noqa: E402
from topopt_in_petsc_tpu.models.elasticity import LinearElasticity  # noqa: E402


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def run(ne, impl, nlvls):
    n = ne + 1
    cfg = TopOptConfig(
        nx=n, ny=n, nz=n, nlvls=nlvls, dtype="float32",
        precise_dots=False, ksp_maxit=200, operator_impl=impl,
    )
    cfg.validate()
    t0 = time.perf_counter()
    phys = LinearElasticity(cfg)
    x = jnp.full(phys.grid.ne, cfg.volfrac, dtype=jnp.float32)
    res = phys.solve_state(x)  # compile + first solve
    _sync(res.x)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = phys.solve_state(x)
    _sync(res.x)
    dt = time.perf_counter() - t0
    print(
        f"{impl:8s} {ne}^3 nlvls={nlvls}: {dt:7.3f} s, "
        f"iters={int(res.iters)}, relres={float(res.relres):.2e} "
        f"(first call incl compile {t_compile:.1f} s)"
    )
    return dt


if __name__ == "__main__":
    ne = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    impls = sys.argv[2:] or ["blocked", "pallas"]
    nlvls = 5 if ne >= 256 else 4
    for impl in impls:
        run(ne, impl, nlvls)
