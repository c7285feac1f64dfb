"""Bisect the 513^3 solve crash: run each composed stage standalone.

Usage: python tools/probe_513_bisect.py <stage> [mgdt]
  stage in {convert, setup, vcycle, solve1}
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from topopt_in_petsc_tpu.grid import Grid  # noqa: E402
from topopt_in_petsc_tpu.models.elements import hex8_stiffness  # noqa: E402
from topopt_in_petsc_tpu.solvers.blocked_mg import BlockedElasticityMG  # noqa: E402


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "vcycle"
    mgdt = (
        jnp.bfloat16
        if (len(sys.argv) > 2 and sys.argv[2] == "bf16")
        else None
    )
    n = 513
    grid = Grid(nn=(n, n, n), lo=(0, 0, 0), hi=(2, 1, 1))
    grids = grid.hierarchy(6)
    KEs = [hex8_stiffness(*g.h, 0.3) for g in grids]
    bmg = BlockedElasticityMG(
        grids, KEs, smooth_sweeps=2, precise_dots=False, mg_dtype=mgdt,
    )
    op0 = bmg.ops[0]
    E = jnp.full(grid.ne, 0.12**3, jnp.float32)
    t0 = time.perf_counter()

    if stage == "convert":
        @jax.jit
        def f(E):
            b = bmg.op32.cantilever_rhs()
            u = bmg.op32.from_blocked(b)
            b2 = bmg.op32.to_blocked(u)
            return bmg.op32.dot(b2, b2), bmg.op32.dot(b, b)

        a, c = f(E)
        print(f"convert ok: {float(a):.6e} vs {float(c):.6e}")
    elif stage == "setup":
        @jax.jit
        def f(E):
            levels = bmg.setup(E)
            return [
                (lvl["lmax"], jnp.sum(lvl["dinv"], dtype=jnp.float32))
                for lvl in levels
            ]

        out = f(E)
        for l, (lm, ds) in enumerate(out):
            print(f"  lvl{l}: lmax={float(lm):.4f} sum_dinv={float(ds):.3e}")
        print("setup ok")
    elif stage == "vcycle":
        @jax.jit
        def f(E):
            levels = bmg.setup(E)
            b = op0.cantilever_rhs(dtype=jnp.float32).astype(bmg.mg_dtype)
            z = bmg.vcycle(levels, b)
            return op0.dot(z, z)

        out = f(E)
        print(f"vcycle ok: z.z={float(out):.6e}")
    elif stage == "solve1":
        @functools.partial(jax.jit, donate_argnums=(0,))
        def f(x0, E):
            b = bmg.op32.cantilever_rhs()
            res = bmg.solve(E, b, x0, rtol=1e-5, maxiter=2)
            return res.x, res.iters, res.relres

        x0 = jnp.zeros((3, op0.rows, op0.Lcp), jnp.float32)
        x, it, rr = f(x0, E)
        print(
            f"solve1 ok: iters={int(it)} relres={float(rr):.3e} "
            f"xx={float(bmg.op32.dot(x, x)):.3e}"
        )
    print(f"{stage} done in {time.perf_counter() - t0:.1f} s")


if __name__ == "__main__":
    main()
