"""Bare blocked matvec probe at a given size/dtype (crash isolation).

Usage: python tools/probe_blocked_mv.py <n> [f32|bf16] [reps]
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
from topopt_in_petsc_tpu.ops.blocked_hex import BlockedHexOperator  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 513
    dt = (
        jnp.bfloat16
        if (len(sys.argv) > 2 and sys.argv[2] == "bf16")
        else jnp.float32
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    grid = Grid(nn=(n, n, n), lo=(0, 0, 0), hi=(2, 1, 1))
    KE = hex8_stiffness(*grid.h, 0.3)
    op = BlockedHexOperator(grid.nn, KE, dtype=dt)
    print(
        f"layout: YB={op.YB} yc={op.yc} Lcp={op.Lcp} rows={op.rows} "
        f"vec={3 * op.rows * op.Lcp * np.dtype(dt).itemsize / 2**30:.2f} GiB",
        flush=True,
    )

    @jax.jit
    def mv(vb, eb):
        return op.mask0(op.matvec(op.refresh(vb), eb))

    @jax.jit
    def setup():
        E = jnp.full(grid.ne, 0.5, jnp.float32)
        eb = op.prepare_coef(E)
        vb = op.cantilever_rhs(dtype=jnp.float32).astype(dt)
        return vb, eb

    vb, eb = setup()
    t0 = time.perf_counter()
    out = mv(vb, eb)
    s = float(op.asum(out))
    print(
        f"first matvec (incl compile): {time.perf_counter() - t0:.1f} s, "
        f"checksum={s:.6e}", flush=True,
    )
    t0 = time.perf_counter()
    for _ in range(reps):
        out = mv(out.astype(dt) if out.dtype != dt else out, eb)
    s = float(op.asum(out))
    dt_s = (time.perf_counter() - t0) / reps
    ndof = 3 * n**3
    nnz = 81 * ndof  # 243/node = 81 per scalar dof-row (27 couplings x 3x3)
    print(
        f"{n - 1}^3 {np.dtype(dt).name}: {dt_s * 1e3:.1f} ms/matvec, "
        f"{nnz / dt_s / 1e9:.0f} Gnnz/s (checksum {s:.3e})"
    )


if __name__ == "__main__":
    main()
