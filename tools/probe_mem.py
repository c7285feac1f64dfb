"""Compile-only HBM footprint probe for the blocked MG solve.

AOT-lowers and compiles the full state solve at a given size and prints
XLA's buffer-assignment numbers (temp/argument/output bytes) WITHOUT
executing — safe at sizes that would OOM or crash the worker.

Usage: python tools/probe_mem.py <n> <sweeps> <ksp> <nlvls> <mgdt> [maxit]
  e.g. python tools/probe_mem.py 513 2 fcg 6 bf16
"""

import functools
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from topopt_in_petsc_tpu.grid import Grid  # noqa: E402
from topopt_in_petsc_tpu.models.elements import hex8_stiffness  # noqa: E402
from topopt_in_petsc_tpu.solvers.blocked_mg import BlockedElasticityMG  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 513
    sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ksp = sys.argv[3] if len(sys.argv) > 3 else "fcg"
    nlvls = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    mode = sys.argv[5] if len(sys.argv) > 5 else "f32"
    mgdt = jnp.bfloat16 if mode == "bf16" else None
    kc = jnp.bfloat16 if mode in ("bf16", "f32c") else None
    maxit = int(sys.argv[6]) if len(sys.argv) > 6 else 200

    grid = Grid(nn=(n, n, n), lo=(0, 0, 0), hi=(2, 1, 1))
    grids = grid.hierarchy(nlvls)
    KEs = [hex8_stiffness(*g.h, 0.3) for g in grids]
    bmg = BlockedElasticityMG(
        grids, KEs, smooth_sweeps=sweeps, precise_dots=False,
        mg_dtype=mgdt, krylov_compress=kc,
    )
    op0 = bmg.op32
    vec_gib = 3 * op0.rows * op0.Lcp * 4 / 2**30
    print(
        f"layout: YB={op0.YB} yc={op0.yc} Lcp={op0.Lcp} rows={op0.rows} "
        f"f32 vec={vec_gib:.2f} GiB"
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def solve(x0, E):
        # the driver's warm start: donated, so the while-loop carry and
        # the returned solution alias it (one fewer live fine vector)
        b = op0.cantilever_rhs()
        res = bmg.solve(
            E, b, x0, rtol=1e-5, maxiter=maxit, ksp_type=ksp,
        )
        return res.x, res.iters, res.relres

    Es = jax.ShapeDtypeStruct(grid.ne, jnp.float32)
    x0s = jax.ShapeDtypeStruct(
        (3, op0.rows, op0.Lcp), jnp.float32
    )
    compiled = solve.lower(x0s, Es).compile()
    ma = compiled.memory_analysis()
    g = 2**30
    print(
        f"{n - 1}^3 sweeps={sweeps} ksp={ksp} nlvls={nlvls} "
        f"mode={mode}: "
        f"temp={ma.temp_size_in_bytes / g:.2f} GiB  "
        f"args={ma.argument_size_in_bytes / g:.2f}  "
        f"out={ma.output_size_in_bytes / g:.2f}  "
        f"alias={ma.alias_size_in_bytes / g:.2f}  "
        f"peak~={(ma.temp_size_in_bytes + ma.argument_size_in_bytes + ma.output_size_in_bytes - ma.alias_size_in_bytes) / g:.2f} GiB"
    )


if __name__ == "__main__":
    main()
