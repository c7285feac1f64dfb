"""Fused opt-iteration probe at a given element count.

Usage: python tools/probe_fused.py <nelem_axis> [nlvls] [mg_dtype]

At >= 1e8 dof the step auto-routes through the host-chunked solve +
tail program (parallel/fused_step.py chunked mode) and at >= 3.5e8 dof
the V-cycle auto-stores bf16 — `python tools/probe_fused.py 512` is
the giga-dof full-iteration probe (405M dof: solve + filter + uKEu +
MMA + projection), the whole-loop analogue of tools/probe_512.py.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from topopt_in_petsc_tpu.config import TopOptConfig  # noqa: E402
from topopt_in_petsc_tpu.parallel.fused_step import make_fused_step  # noqa: E402


def _sync(o):
    # sync on a REPLICATED SCALAR leaf (fx): reading any output forces
    # the step program to finish, and scalar readback avoids both the
    # reshape(-1) lane-pad relayout (65 GiB at 513^3) and the
    # dynamic_slice INVALID_ARGUMENT the backend raises when slicing
    # giant element fields (probed at 384^3)
    a = jnp.asarray(jax.tree_util.tree_leaves(o)[0])
    assert a.ndim == 0, "sync target must be a scalar leaf"
    return float(a)


def main():
    ne = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    nlvls = int(sys.argv[2]) if len(sys.argv) > 2 else (
        6 if ne % 32 == 0 else 5
    )
    mg_dtype = sys.argv[3] if len(sys.argv) > 3 else "same"
    # diagnosis accelerator: a tiny ksp_maxit reaches the tail program
    # in seconds instead of a full 80-s solve per attempt
    maxit = int(sys.argv[4]) if len(sys.argv) > 4 else 400
    tail_split = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
    n = ne + 1
    cfg = TopOptConfig(
        nx=n, ny=n, nz=n, nlvls=nlvls, dtype="float32",
        precise_dots=False, ksp_maxit=maxit, operator_impl="auto",
        mg_dtype=mg_dtype, tail_split=tail_split,
        smooth_sweeps=2 if ne >= 512 else 4,
    )
    cfg.validate()
    step, state = make_fused_step(cfg)
    print(f"ndof={cfg.ndof:,}, nlvls={nlvls}, "
          f"mg_dtype={cfg.resolve_mg_mode(cfg.ndof)} (cli: {mg_dtype}), "
          f"ksp_maxit={maxit}, park={cfg.resolve_park(cfg.ndof)}, "
          f"tail_split={tail_split}",
          flush=True)
    t0 = time.perf_counter()
    s = step(state, 1)
    _sync(s.fx)
    print(f"iter 1 (incl compile): {time.perf_counter() - t0:.1f} s "
          f"(solver_iters={int(s.solver_iters)})", flush=True)
    for itr in (2, 3):
        t0 = time.perf_counter()
        s = step(s, itr)
        _sync(s.fx)
        print(f"iter {itr}: {time.perf_counter() - t0:.1f} s "
              f"(solver_iters={int(s.solver_iters)})", flush=True)
    t0 = time.perf_counter()
    s = step(s, 4)
    _sync(s.fx)
    dt = time.perf_counter() - t0
    print(
        f"fused opt-iter {ne}^3 nlvls={nlvls}: {dt:.3f} s/iteration "
        f"(solver_iters={int(s.solver_iters)}, fx={float(s.fx):.4f}, "
        f"ndof={cfg.ndof:,})"
    )


if __name__ == "__main__":
    main()
