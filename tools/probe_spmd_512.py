"""SPMD-engine state-solve probe on ONE chip (mesh (1,1,1)).

Measures the pod execution path (parallel/spmd_model.py: shard_map +
blocked-resident solver + iota-predicate masks/RHS + host-chunked
Krylov) at a given size on a single chip, where halo exchanges are
no-ops — the overhead vs the single-chip solver (tools/probe_512.py)
isolates the shard_map/engine cost, and a green 512^3 run proves the
per-chip memory budget of the zero-storage SPMD engine (what each pod
chip would hold for a 1024^3 run on 8 chips).

Usage: python tools/probe_spmd_512.py [nelem_axis] [nlvls] [mg_dtype]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from topopt_in_petsc_tpu.config import TopOptConfig  # noqa: E402
from topopt_in_petsc_tpu.parallel.spmd_model import (  # noqa: E402
    make_spmd_fused_step,
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
    step, state, engine = make_spmd_fused_step(cfg)
    print(f"ndof={cfg.ndof:,}, nlvls={nlvls}, mg_dtype={mg_dtype}, "
          f"engine=blocked-SPMD (1,1,1)", flush=True)
    t0 = time.perf_counter()
    s = step(state, 1)
    _sync(s.fx)
    print(f"iter 1 (incl compile): {time.perf_counter() - t0:.1f} s "
          f"(solver_iters={int(s.solver_iters)})", flush=True)
    for itr in (2, 3, 4):
        t0 = time.perf_counter()
        s = step(s, itr)
        _sync(s.fx)
        print(f"iter {itr}: {time.perf_counter() - t0:.1f} s "
              f"(solver_iters={int(s.solver_iters)}, "
              f"fx={float(s.fx):.4f})", flush=True)


if __name__ == "__main__":
    main()
