"""512^3 single-chip state-solve fit probe.

Usage: python tools/probe_512.py [sweeps] [flexible01] [nlvls] [maxit]
"""

import functools
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
from topopt_in_petsc_tpu.solvers.blocked_mg import BlockedElasticityMG  # noqa: E402
from topopt_in_petsc_tpu.solvers.cg import pcg  # noqa: E402


def _sync(o):
    # scalar INDEX, not reshape(-1)[0]: reshaping a minor-dim-3 tiled
    # array to 1-D lane-pads 3->128 (a 65 GiB relayout at 513^3)
    a = jnp.asarray(jax.tree_util.tree_leaves(o)[0])
    return float(a[(0,) * a.ndim])


def main():
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    flexible = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    nlvls = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    maxit = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    mode = sys.argv[5] if len(sys.argv) > 5 else "f32"
    # "mixed": f32 fine-level smoothing + bf16 coarse levels (the
    # bf16-iteration-doubling experiment, docs/PERFORMANCE.md)
    mgdt = {"bf16": jnp.bfloat16, "mixed": "mixed"}.get(mode)
    kc = jnp.bfloat16 if mode in ("bf16", "f32c", "mixed") else None
    n = int(sys.argv[6]) if len(sys.argv) > 6 else 513
    cheby_lower = float(sys.argv[7]) if len(sys.argv) > 7 else 0.06
    fine_post = int(sys.argv[8]) if len(sys.argv) > 8 else 0
    grid = Grid(nn=(n, n, n), lo=(0, 0, 0), hi=(2, 1, 1))
    grids = grid.hierarchy(nlvls)
    KEs = [hex8_stiffness(*g.h, 0.3) for g in grids]
    bmg = BlockedElasticityMG(
        grids, KEs, smooth_sweeps=sweeps, precise_dots=False,
        mg_dtype=mgdt, krylov_compress=kc, cheby_lower=cheby_lower,
        fine_post_smooth=fine_post,
    )
    op0 = bmg.ops[0]
    print(
        f"layout: YB={op0.YB} yc={op0.yc} Lcp={op0.Lcp} rows={op0.rows} "
        f"vec={3 * op0.rows * op0.Lcp * 4 / 2**30:.2f} GiB",
        flush=True,
    )
    E = jnp.full(grid.ne, 0.12**3, jnp.float32)

    def solve(x0, E):
        # chunked host loop: this backend kills device executions
        # beyond ~1-2 min; the Krylov state crosses the jit boundary.
        # b=None: the cantilever load is built INSIDE the init program
        return bmg.solve_chunked(
            E, None, x0, rtol=1e-5, maxiter=maxit, chunk=32,
            ksp_type="fcg" if flexible else "cg",
            callback=lambda k, rr: print(
                f"  k={k} relres={rr:.3e}", flush=True
            ),
        )

    def fresh_x0():
        return jnp.zeros((3, op0.rows, op0.Lcp), jnp.float32)

    t0 = time.perf_counter()
    res = solve(fresh_x0(), E)
    _sync(res.x)
    print(f"first call (incl compile): {time.perf_counter() - t0:.1f} s",
          flush=True)
    iters0, relres0 = int(res.iters), float(res.relres)
    res = None  # free the 1.7 GiB solution before the timed call
    E = jnp.full(grid.ne, 0.12**3, jnp.float32)
    t0 = time.perf_counter()
    res = solve(fresh_x0(), E)
    _sync(res.x)
    dt = time.perf_counter() - t0
    ndof = 3 * n**3
    print(
        f"{n-1}^3 sweeps={sweeps} flexible={flexible} nlvls={nlvls} "
        f"mg={mode} cheby_lower={cheby_lower} fine_post={fine_post}: "
        f"{dt:.3f} s, iters={int(res.iters)}, "
        f"relres={float(res.relres):.2e}, ndof={ndof:,}, "
        f"PCG {ndof * max(int(res.iters), 1) / dt / 1e6:.0f} Mdof*iter/s"
    )


if __name__ == "__main__":
    main()
