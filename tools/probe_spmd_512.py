"""SPMD-engine STATE-SOLVE probe on ONE chip (mesh (1,1,1)).

Measures the pod execution path for the solve leg ONLY
(parallel/spmd_model.SpmdChunkedSolve: shard_map + blocked-resident
solver + iota-predicate masks/RHS + host-chunked Krylov) at a given
size on a single chip, where halo exchanges are no-ops — mirroring
tools/probe_512.py through the SPMD engine, so the delta isolates the
shard_map/engine tax, and a green 512^3 run proves the per-chip memory
budget of the zero-storage SPMD solve (what each pod chip holds during
the state solve of a 1024^3 run on 8 chips).

The round-4 version of this probe ran the FULL fused step, which
cannot fit one chip at 512^3 regardless of engine overhead
(docs/PERFORMANCE.md "fused-512 memory") — its OOM was uninformative.

Usage: python tools/probe_spmd_512.py [nelem_axis] [nlvls] [mg_dtype]
Reference: LinearElasticity.cc:204 (KSPSolve), SURVEY.md §2.2-5.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from topopt_in_petsc_tpu.config import TopOptConfig  # noqa: E402
from topopt_in_petsc_tpu.parallel.spmd_model import (  # noqa: E402
    SpmdElasticity,
    make_spmd_chunked_solve,
)


def _sync(o):
    # scalar INDEX, not reshape(-1)[0]: reshaping a minor-dim-3 tiled
    # array to 1-D lane-pads 3->128 (a 65 GiB relayout at 513^3)
    a = jnp.asarray(jax.tree_util.tree_leaves(o)[0])
    return float(a[(0,) * a.ndim])


def main():
    ne = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    nlvls = int(sys.argv[2]) if len(sys.argv) > 2 else (
        6 if ne % 32 == 0 else 5
    )
    mg_dtype = sys.argv[3] if len(sys.argv) > 3 else "same"
    n = ne + 1
    cfg = TopOptConfig(
        nx=n, ny=n, nz=n, nlvls=nlvls, dtype="float32",
        precise_dots=False, ksp_maxit=400, operator_impl="blocked",
        mg_dtype=mg_dtype, smooth_sweeps=2 if ne >= 512 else 4,
        mesh_shape=(1, 1, 1),
    )
    cfg.validate()
    engine = SpmdElasticity(cfg)
    csolve = make_spmd_chunked_solve(engine)
    print(
        f"ndof={cfg.ndof:,}, nlvls={nlvls}, "
        f"mg_dtype={cfg.resolve_mg_mode(cfg.ndof)} (cli: {mg_dtype}), "
        f"ksp_chunk={csolve.chunk}, engine=blocked-SPMD (1,1,1), "
        f"solve-only",
        flush=True,
    )
    xPhys = engine.blocked_elem(
        np.full(engine.grid.ne, 0.12, np.float32)
    )

    def run():
        u0 = engine.zeros_kernel_blk()  # fresh: donated into the solve
        pst, relres = csolve.solve(
            xPhys, u0,
            callback=lambda k, rr: print(
                f"  k={k} relres={rr:.3e}", flush=True
            ),
        )
        _sync(pst.x)
        return pst, relres

    t0 = time.perf_counter()
    pst, relres = run()
    print(
        f"first call (incl compile): {time.perf_counter() - t0:.1f} s "
        f"(iters={int(pst.k)}, relres={relres:.2e})",
        flush=True,
    )
    pst = None  # free the solution before the timed call
    t0 = time.perf_counter()
    pst, relres = run()
    dt_s = time.perf_counter() - t0
    ndof = cfg.ndof
    print(
        f"spmd-solve {ne}^3 nlvls={nlvls}: {dt_s:.3f} s, "
        f"iters={int(pst.k)}, relres={relres:.2e}, ndof={ndof:,}, "
        f"PCG {ndof * max(int(pst.k), 1) / dt_s / 1e6:.0f} Mdof*iter/s"
    )


if __name__ == "__main__":
    main()
