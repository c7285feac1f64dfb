"""Warm the persistent XLA compile cache for every bench.py stage.

bench.py guards each stage with a SIGALRM timeout so one slow compile
cannot eat the whole driver-run budget — but an alarm-interrupted
remote compile is NOT cached, so after a cache-invalidating jax bump
the stages can starve each other forever.  This script runs the same
programs with NO alarms (each compile takes as long as it takes, and
lands in .jax_cache), so the next `python bench.py` measures from a
warm cache.

Usage: python tools/warm_cache.py [stage...]
  stages: spmv solve128 opt128 opt256 p512  (default: all)
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def log(msg):
    print(f"[warm {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    stages = sys.argv[1:] or ["spmv", "solve128", "opt128", "opt256",
                              "p512"]
    t00 = time.perf_counter()
    if "spmv" in stages:
        for ne, impl in ((256, "blocked"), (256, "pallas"), (256, "xla")):
            t0 = time.perf_counter()
            dt, _ = bench.bench_spmv(ne, impl)
            log(f"spmv {ne}^3 [{impl}]: {dt * 1e3:.2f} ms/matvec "
                f"(stage {time.perf_counter() - t0:.0f} s)")
    if "solve128" in stages:
        t0 = time.perf_counter()
        sdt, iters, relres, _ = bench.bench_solve(128)
        log(f"solve 128^3: {sdt:.2f} s, {iters} its "
            f"(stage {time.perf_counter() - t0:.0f} s)")
    if "opt128" in stages:
        t0 = time.perf_counter()
        it_dt, s2 = bench.bench_opt_iter(128, 4)
        log(f"opt-iter 128^3: {it_dt:.2f} s "
            f"(stage {time.perf_counter() - t0:.0f} s)")
        s2 = None
    if "opt256" in stages:
        t0 = time.perf_counter()
        it_dt, s2 = bench.bench_opt_iter(256, 5)
        log(f"opt-iter 256^3: {it_dt:.2f} s "
            f"(stage {time.perf_counter() - t0:.0f} s)")
        s2 = None
    if "p512" in stages:
        t0 = time.perf_counter()
        phys, x, cfg = bench.setup_512()
        iters = bench.warm_512(phys, x)
        log(f"512^3 warm: {iters} its "
            f"(stage {time.perf_counter() - t0:.0f} s)")
        sdt, iters, relres = bench.measure_512(phys, x)
        log(f"512^3 solve: {sdt:.1f} s, {iters} its, relres {relres:.2e}")
    log(f"done in {time.perf_counter() - t00:.0f} s")


if __name__ == "__main__":
    main()
