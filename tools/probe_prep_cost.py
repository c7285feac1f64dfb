"""TPU probe: how much of a Pallas hex matvec is layout prep vs kernel?

Times, at a given grid size:
  - apply (prep_u + kernel + unpack)  — what the solver pays per matvec
  - kernel alone on pre-blocked inputs
  - prep_u alone
  - unpack (_run minus call) inferred

Run alone on the TPU: `python tools/probe_prep_cost.py [n]`.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from topopt_in_petsc_tpu.grid import Grid  # noqa: E402
from topopt_in_petsc_tpu.models.elements import hex8_stiffness  # noqa: E402
from topopt_in_petsc_tpu.ops.pallas_hex import make_pallas_hex_apply  # noqa: E402


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main(ne=256):
    n = ne + 1
    grid = Grid(nn=(n, n, n), lo=(0, 0, 0), hi=(2, 1, 1))
    KE = hex8_stiffness(*grid.h, 0.3)
    pal = make_pallas_hex_apply(grid.nn, np.asarray(KE))
    print("layout:", pal._layout, file=sys.stderr)

    key = jax.random.PRNGKey(0)
    E = jax.random.uniform(key, grid.ne, jnp.float32, 1e-9, 1.0)
    u = jax.random.normal(jax.random.PRNGKey(1), (*grid.nn, 3),
                          jnp.float32)

    eb = jax.jit(pal.prepare_coef)(E)
    _sync(eb)
    ub = jax.jit(lambda u: tuple(pal._prep_u(u)))(u)
    _sync(ub)

    apply_j = jax.jit(pal.apply_prepared)
    kern_j = jax.jit(lambda ubs, eb: pal._call(ubs[0], ubs[1], ubs[2], eb))
    prep_j = jax.jit(lambda u: tuple(pal._prep_u(u)))
    run_j = jax.jit(lambda ubs, eb: pal._run(list(ubs), eb, jnp.float32))

    t_apply = timeit(apply_j, u, eb)
    t_kern = timeit(kern_j, ub, eb)
    t_prep = timeit(prep_j, u)
    t_kern_unpack = timeit(run_j, ub, eb)

    ndof = 3 * grid.nnode
    nnz = 81 * ndof  # 243/node = 81 per scalar dof-row (27 couplings x 3x3)
    print(f"grid {ne}^3  ndof={ndof:,}")
    print(f"apply (prep+kern+unpack): {t_apply*1e3:8.3f} ms  "
          f"({nnz/t_apply/1e9:.0f} Gnnz/s)")
    print(f"kernel alone:             {t_kern*1e3:8.3f} ms  "
          f"({nnz/t_kern/1e9:.0f} Gnnz/s)")
    print(f"prep_u alone:             {t_prep*1e3:8.3f} ms")
    print(f"kernel+unpack:            {t_kern_unpack*1e3:8.3f} ms")
    print(f"=> unpack ~{(t_kern_unpack-t_kern)*1e3:.3f} ms, "
          f"prep ~{t_prep*1e3:.3f} ms, "
          f"layout overhead {(t_apply-t_kern)/t_apply*100:.0f}% of apply")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
