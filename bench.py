"""Benchmark harness — run on one real TPU chip.

Primary metric (stdout, ONE json line): effective SpMV throughput of the
matrix-free elasticity operator at 256^3 elements, in nnz/s.  "Effective
nnz" counts the nonzeros the reference's assembled BAIJ matrix would hold:
27 node-couplings per node x 3x3 block entries = 243 nnz per node, i.e.
81 * ndof with ndof = 3 * nnodes (SURVEY §6 / BASELINE.md).  NOTE:
rounds 1-3 reported 3x this (27*9*ndof = 729/node, double-counting the
dof factor); all pre-round-4 Gnnz/s figures divide by 3 to compare.

vs_baseline: ratio against the reference's estimated per-core CPU SpMV
throughput of 5.0e8 nnz/s (a PETSc BAIJ SpMV streams ~12 bytes/nnz; at
~6 GB/s effective per-core memory bandwidth that is ~5e8 nnz/s — the repo
publishes no numbers, BASELINE.md requires an estimate to be stated).
Target from BASELINE.md: vs_baseline >= 2.

Extra diagnostics (stderr): MG-PCG solve DOF/s and wall-clock per full
optimization iteration at 128^3.
"""

from __future__ import annotations

import contextlib
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: XLA programs at 128^3/256^3 take minutes to
# compile on first build; cached reruns are seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PER_CORE_CPU_NNZ_S = 5.0e8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class StageTimeout(Exception):
    pass


@contextlib.contextmanager
def stage_timeout(seconds: int):
    """SIGALRM guard so one slow compile can't eat the whole bench."""

    def handler(signum, frame):
        raise StageTimeout()

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _sync(out):
    """Force completion via a scalar readback: on this axon backend
    `block_until_ready` does NOT synchronize pallas-containing programs
    (measured: a 200 ms kernel reads as 0.1 ms).

    Scalar INDEXING, not reshape(-1)[0]: reshaping a minor-dim-3 tiled
    array to 1-D lane-pads 3->128 (a ~43x relayout copy — 65 GiB for a
    (513,513,513,3) field, which crashes the 512^3 stage at compile)."""
    leaf = jnp.asarray(jax.tree_util.tree_leaves(out)[0])
    return float(leaf[(0,) * leaf.ndim])


def _time_fn(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def bench_spmv(nelem_axis: int, impl: str = "pallas") -> float:
    """Masked K@u at nelem_axis^3 elements; returns seconds per matvec."""
    from topopt_in_petsc_tpu.grid import Grid
    from topopt_in_petsc_tpu.models.elasticity import build_cantilever_bc
    from topopt_in_petsc_tpu.models.elements import hex8_stiffness
    from topopt_in_petsc_tpu.ops.hex_operator import apply_hex_operator
    from topopt_in_petsc_tpu.ops.pallas_hex import make_pallas_hex_apply

    n = nelem_axis + 1
    grid = Grid(nn=(n, n, n), lo=(0, 0, 0), hi=(2, 1, 1))
    KE = jnp.asarray(hex8_stiffness(*grid.h, 0.3), jnp.float32)
    N_np, _ = build_cantilever_bc(grid, dtype=np.float32)
    N = jnp.asarray(N_np)

    key = jax.random.PRNGKey(0)
    E = jax.random.uniform(
        key, grid.ne, dtype=jnp.float32, minval=1e-9, maxval=1.0
    )
    u = jax.random.normal(
        jax.random.PRNGKey(1), (*grid.nn, 3), dtype=jnp.float32
    )

    if impl == "blocked":
        # resident-layout operator exactly as the solver hot loop runs
        # it (solvers/blocked_mg.py): refresh + matvec + Dirichlet row
        # mask, vectors never leaving the kernel layout
        from topopt_in_petsc_tpu.ops.blocked_hex import (
            BlockedHexOperator,
        )

        op = BlockedHexOperator(grid.nn, np.asarray(KE))

        @jax.jit
        def A(vb, eb):
            return op.mask0(op.matvec(op.refresh(vb), eb))

        vb = jax.jit(op.to_blocked)(u)
        eb = jax.jit(op.prepare_coef)(E)
        dt = _time_fn(A, vb, eb)
        return dt, grid
    if impl == "pallas":
        pal = make_pallas_hex_apply(grid.nn, np.asarray(KE))

        @jax.jit
        def A(v, E, N):
            Kv = pal(N * v, E)
            return N * Kv + (1.0 - N) * v

    else:

        @jax.jit
        def A(v, E, N):
            Kv = apply_hex_operator(N * v, E, KE)
            return N * Kv + (1.0 - N) * v

    dt = _time_fn(A, u, E, N)
    return dt, grid


def bench_solve(nelem_axis: int, nlvls: int = 4):
    """Full MG-PCG state solve at nelem_axis^3 elements."""
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.models.elasticity import LinearElasticity

    n = nelem_axis + 1
    cfg = TopOptConfig(
        nx=n, ny=n, nz=n, nlvls=nlvls, dtype="float32",
        precise_dots=False, ksp_maxit=200, operator_impl="auto",
    )
    cfg.validate()
    phys = LinearElasticity(cfg)
    x = jnp.full(phys.grid.ne, cfg.volfrac, dtype=jnp.float32)

    # solve_state DONATES the warm-start buffer: fresh zeros per call
    res = phys.solve_state(x)  # compile + first solve
    _sync(res.x)
    t0 = time.perf_counter()
    res = phys.solve_state(x)
    _sync(res.x)
    dt = time.perf_counter() - t0
    return dt, int(res.iters), float(res.relres), cfg


def setup_512(ne: int = 512, nlvls: int = 6):
    """Build the 512^3 problem (compile happens on the first solve)."""
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.models.elasticity import LinearElasticity

    cfg = TopOptConfig(
        nx=ne + 1, ny=ne + 1, nz=ne + 1, nlvls=nlvls, dtype="float32",
        precise_dots=False, smooth_sweeps=2, ksp_maxit=400,
        operator_impl="auto",
    )
    cfg.validate()
    phys = LinearElasticity(cfg)
    x = jnp.full(phys.grid.ne, cfg.volfrac, dtype=jnp.float32)
    return phys, x, cfg


def warm_512(phys, x):
    """Compile + first solve (the cold-cache Mosaic build of the 512^3
    programs can take 20+ minutes; it gets its OWN stage/timeout so a
    cache-invalidating jax bump degrades to a reported warm-up failure
    instead of silently eating the measured stage)."""
    res = phys.solve_state(x)
    _sync(res.x)
    return int(res.iters)


def measure_512(phys, x):
    """Timed 512^3 (405M dof) state solve: bf16 V-cycle storage (auto at
    this size), f32 outer FCG, host-chunked Krylov loop (this backend
    kills >1-2 min device executions)."""
    t0 = time.perf_counter()
    res = phys.solve_state(x)
    _sync(res.x)
    dt = time.perf_counter() - t0
    return dt, int(res.iters), float(res.relres)


def bench_opt_iter(nelem_axis: int, nlvls: int = 4, **cfg_kw):
    """One fused optimization iteration (solve+filter+MMA)."""
    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.parallel.fused_step import make_fused_step

    n = nelem_axis + 1
    cfg = TopOptConfig(
        nx=n, ny=n, nz=n, nlvls=nlvls, dtype="float32",
        precise_dots=False, operator_impl="auto",
        **{"ksp_maxit": 200, **cfg_kw},
    )
    step, state = make_fused_step(cfg)
    # honest driver semantics: itr 1 (fscale + fresh asymptotes) and
    # itr 2 (fresh asymptotes) run first, the STEADY-STATE variant
    # (itr >= 3) is what gets timed
    s = step(state, 1)  # compile + iteration 1
    _sync(s.x)
    s = step(s, 2)
    _sync(s.x)
    s = step(s, 3)  # compile steady-state variant
    _sync(s.x)
    t0 = time.perf_counter()
    s2 = step(s, 4)
    _sync(s2.x)
    return time.perf_counter() - t0, s2


def emit(value, vs_baseline, metric, stages):
    """The contract: exactly ONE json line on stdout, ALWAYS — a downed
    TPU backend reports as status fields, never a stack trace."""
    print(
        json.dumps(
            {
                "metric": metric,
                "value": value,
                "unit": "nnz/s",
                "vs_baseline": vs_baseline,
                "stages": stages,
            }
        )
    )


def main():
    stages: dict = {}

    # BENCH_SMOKE=1: identical code paths at tiny sizes — the SUCCESS
    # path (stage bookkeeping, metric naming, emit) is CPU-testable
    # instead of first executing for real against the driver's TPU run
    smoke = bool(os.environ.get("BENCH_SMOKE"))
    spmv_trials = (
        ((16, "blocked"), (16, "xla")) if smoke else
        ((256, "blocked"), (256, "pallas"), (256, "xla"),
         (128, "blocked"), (128, "xla"))
    )
    solve_ne = 16 if smoke else 128
    opt1 = (16, 2) if smoke else (128, 4)
    opt2 = (16, 2) if smoke else (256, 5)
    solve2_ne, solve2_nlvls = (16, 2) if smoke else (256, 5)
    big_ne, big_nlvls = (32, 2) if smoke else (512, 6)

    # --- backend probe: jax.devices() HANGS inside native gRPC when
    # the TPU tunnel is down (SIGALRM can't interrupt it — the handler
    # never runs while the main thread is blocked in C++), so probe in
    # a SUBPROCESS with a hard kill.  It exits before this process
    # touches the chip (only one TPU client at a time). ---
    import subprocess

    try:
        probe = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax; d = jax.devices()[0]; "
                "print(d.platform, getattr(d, 'device_kind', '?'))",
            ],
            capture_output=True,
            text=True,
            timeout=240,
        )
        probe_ok = probe.returncode == 0
        probe_msg = (probe.stdout if probe_ok else probe.stderr).strip()
    except subprocess.TimeoutExpired:
        probe_ok = False
        probe_msg = "timeout: jax.devices() hung (tunnel down)"
    if not probe_ok:
        log(f"backend probe failed: {probe_msg.splitlines()[-1][:300]}")
        stages["backend"] = {
            "ok": False,
            "error": probe_msg.splitlines()[-1][:300] if probe_msg
            else "backend init failed",
        }
        emit(None, None, "elasticity_spmv_nnz_per_s", stages)
        return
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    stages["backend"] = {
        "ok": True, "platform": dev.platform,
        "kind": str(getattr(dev, "device_kind", "?")),
    }

    # --- primary: SpMV nnz/s at 256^3, blocked-resident kernel
    # (fallbacks: per-apply pallas, xla form, then 128^3) ---
    nnz_s = None
    metric = "elasticity_spmv_nnz_per_s"  # suffixed on success only
    first_trial = True
    for ne, impl in spmv_trials:
        try:
            # the preferred (first) implementation gets a cold-cache
            # compile budget: an alarm-interrupted remote compile is
            # NOT cached, so a short fuse after a cache-invalidating
            # jax bump would starve every retry forever (round-4 r3->r4
            # bump: the 256^3 blocked program took >560 s to rebuild)
            with stage_timeout(1500 if first_trial else 560):
                first_trial = False
                dt, grid = bench_spmv(ne, impl)
            log(f"spmv impl={impl}")
            ndof = 3 * grid.nnode
            # 243 nnz/node = 81 nnz per scalar dof-row (27 node-
            # couplings x 3x3 blocks); rounds 1-3 inflated this 3x
            nnz_s = 81 * ndof / dt
            log(
                f"spmv {ne}^3: {dt * 1e3:.3f} ms/matvec, ndof={ndof:,},"
                f" eff {nnz_s / 1e9:.2f} Gnnz/s"
            )
            stages["spmv"] = {
                "ok": True, "size": ne, "impl": impl,
                "ms_per_matvec": dt * 1e3, "gnnz_s": nnz_s / 1e9,
            }
            metric = f"elasticity_spmv_nnz_per_s_{ne}^3"
            break
        except (StageTimeout, Exception) as e:  # noqa: BLE001
            log(f"spmv@{ne}^3[{impl}] failed: {type(e).__name__}: {e}")
            stages["spmv"] = {
                "ok": False, "error": f"{type(e).__name__}: {e}"[:300],
            }

    # --- diagnostics: MG-PCG solve + full opt iteration at 128^3 ---
    try:
        with stage_timeout(900):
            sdt, iters, relres, cfg = bench_solve(solve_ne)
        dof_s = cfg.ndof * max(iters, 1) / sdt
        log(
            f"solve {solve_ne}^3: {sdt:.3f} s, iters={iters}, "
            f"relres={relres:.2e}, PCG {dof_s / 1e6:.1f} Mdof*iter/s"
        )
        stages["solve_128"] = {
            "ok": True, "s": sdt, "iters": iters, "relres": relres,
        }
    except (StageTimeout, Exception) as e:  # noqa: BLE001
        log(f"solve bench failed: {type(e).__name__}: {e}")
        stages["solve_128"] = {
            "ok": False, "error": f"{type(e).__name__}: {e}"[:300],
        }

    try:
        with stage_timeout(900):
            it_dt, s2 = bench_opt_iter(*opt1)
        log(
            f"opt-iter {opt1[0]}^3: {it_dt:.3f} s/iteration "
            f"(solver_iters={int(s2.solver_iters)}, fx={float(s2.fx):.4f})"
        )
        stages["opt_iter_128"] = {
            "ok": True, "s_per_iter": it_dt,
            "solver_iters": int(s2.solver_iters),
        }
    except (StageTimeout, Exception) as e:  # noqa: BLE001
        log(f"opt-iter bench failed: {type(e).__name__}: {e}")
        stages["opt_iter_128"] = {
            "ok": False, "error": f"{type(e).__name__}: {e}"[:300],
        }

    # BASELINE.md config #4: wall-clock per opt iteration at 256^3
    # (fused single-program step, 5-level MG, one chip)
    try:
        with stage_timeout(1200):
            it_dt, s2 = bench_opt_iter(opt2[0], nlvls=opt2[1])
        log(
            f"opt-iter {opt2[0]}^3 (fused): {it_dt:.3f} s/iteration "
            f"(solver_iters={int(s2.solver_iters)}, fx={float(s2.fx):.4f})"
        )
        stages["opt_iter_256"] = {
            "ok": True, "s_per_iter": it_dt,
            "solver_iters": int(s2.solver_iters),
        }
    except (StageTimeout, Exception) as e:  # noqa: BLE001
        log(f"opt-iter 256^3 bench failed: {type(e).__name__}: {e}")
        stages["opt_iter_256"] = {
            "ok": False, "error": f"{type(e).__name__}: {e}"[:300],
        }

    s2 = None  # release the 256^3 OptState before the 512^3 stage (HBM)

    # standalone 256^3 MG-PCG state solve (driver-artifact provenance
    # for the PERFORMANCE.md headline row; previously only a builder
    # probe, tools/probe_blocked_solve.py)
    try:
        with stage_timeout(1200):
            sdt, iters, relres, cfg = bench_solve(
                solve2_ne, nlvls=solve2_nlvls
            )
        log(
            f"solve {solve2_ne}^3: {sdt:.3f} s, iters={iters}, "
            f"relres={relres:.2e}, PCG "
            f"{cfg.ndof * max(iters, 1) / sdt / 1e6:.0f} Mdof*iter/s"
        )
        stages["solve_256"] = {
            "ok": True, "s": sdt, "iters": iters, "relres": relres,
        }
    except (StageTimeout, Exception) as e:  # noqa: BLE001
        log(f"solve 256^3 bench failed: {type(e).__name__}: {e}")
        stages["solve_256"] = {
            "ok": False, "error": f"{type(e).__name__}: {e}"[:300],
        }

    # BASELINE.md config #5's single-chip leg: 512^3 (405M dof) solve,
    # split warm-up (compile-heavy, own generous budget) / measure
    phys5 = None
    try:
        with stage_timeout(60):
            phys5, x5, cfg5 = setup_512(big_ne, big_nlvls)
        with stage_timeout(3000):
            t0 = time.perf_counter()
            warm_iters = warm_512(phys5, x5)
            log(
                f"512^3 warm-up (compile + first solve): "
                f"{time.perf_counter() - t0:.1f} s, iters={warm_iters}"
            )
        stages["warm_512"] = {"ok": True, "iters": warm_iters}
    except (StageTimeout, Exception) as e:  # noqa: BLE001
        log(f"512^3 warm-up failed: {type(e).__name__}: {e}")
        stages["warm_512"] = {
            "ok": False, "error": f"{type(e).__name__}: {e}"[:300],
        }
        phys5 = None
    if phys5 is not None:
        try:
            with stage_timeout(900):
                sdt, iters, relres = measure_512(phys5, x5)
            log(
                f"solve 512^3 (405M dof, one chip): {sdt:.1f} s, "
                f"iters={iters}, relres={relres:.2e}, PCG "
                f"{cfg5.ndof * max(iters, 1) / sdt / 1e6:.0f} Mdof*iter/s"
            )
            stages["solve_512"] = {
                "ok": True, "s": sdt, "iters": iters, "relres": relres,
            }
        except (StageTimeout, Exception) as e:  # noqa: BLE001
            log(f"solve 512^3 bench failed: {type(e).__name__}: {e}")
            stages["solve_512"] = {
                "ok": False, "error": f"{type(e).__name__}: {e}"[:300],
            }

    phys5 = x5 = None  # release the 512^3 solver before the fused stage

    # the giga-dof FULL optimization iteration (solve + filter + MMA at
    # 405M dof on one chip: -park_design host parking + bf16 V-cycle +
    # host-chunked Krylov).  Own stage so a failure (the historical
    # INVALID_ARGUMENT / RESOURCE_EXHAUSTED classes) degrades to an
    # honest red row instead of eating the run.
    if os.environ.get("BENCH_SKIP_FUSED512"):
        stages["opt_iter_512"] = {"ok": False, "error": "skipped"}
    else:
        try:
            with stage_timeout(4200):
                it_dt, s2 = bench_opt_iter(
                    big_ne, nlvls=big_nlvls, ksp_maxit=400,
                    smooth_sweeps=2 if big_ne >= 512 else 4,
                )
            log(
                f"opt-iter {big_ne}^3 (fused, parked): {it_dt:.1f} "
                f"s/iteration (solver_iters={int(s2.solver_iters)}, "
                f"fx={float(s2.fx):.4f})"
            )
            stages["opt_iter_512"] = {
                "ok": True, "s_per_iter": it_dt,
                "solver_iters": int(s2.solver_iters),
            }
        except (StageTimeout, Exception) as e:  # noqa: BLE001
            log(f"opt-iter 512^3 bench failed: {type(e).__name__}: {e}")
            stages["opt_iter_512"] = {
                "ok": False, "error": f"{type(e).__name__}: {e}"[:300],
            }
        s2 = None

    emit(
        nnz_s,
        None if nnz_s is None else nnz_s / PER_CORE_CPU_NNZ_S,
        metric,
        stages,
    )


if __name__ == "__main__":
    main()
