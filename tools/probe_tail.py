"""Bisect the 384^3 fused-TAIL INVALID_ARGUMENT by component.

All four round-4 suspects (Pallas/XLA quadform, 444^3 FFT conv,
from_blocked) are green standalone (runs/probe_*_38*.log), yet the
composed tail program still fails — so either the one component never
isolated (the MMA dual interior point on 56M-element fields) or the
composition itself (program size / donation graph) is at fault.

Modes (argv[1], default 'mma'):
  mma   — movelimits + MMA dual-IP update + asymptotes on ne^3 fields
  grad  — filter gradient chain rule (2 FFT convs + divisions)
  proj  — filter project (1 conv + Heaviside)
  obj   — objective parts from a blocked u (from_blocked + quadform +
          reductions), the exact tail head
Usage: python tools/probe_tail.py [mode] [ne=384]
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


def _sync(a):
    a = jnp.asarray(a)
    return float(a[(0,) * a.ndim])


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "mma"
    ne = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    n = ne + 1
    nlvls = 6 if ne % 32 == 0 else 5
    cfg = TopOptConfig(
        nx=n, ny=n, nz=n, nlvls=nlvls, dtype="float32",
        precise_dots=False,
        # "obj" needs the blocked solver's op32 (interpreted on CPU)
        operator_impl="blocked" if mode == "obj" else "auto",
    )
    cfg.validate()
    dt = jnp.float32
    shape = (ne, ne, ne)
    x = jnp.full(shape, cfg.volfrac, dt)
    print(f"mode={mode} ne={ne}", flush=True)

    if mode == "mma":
        from topopt_in_petsc_tpu.opt.mma import MMA
        from topopt_in_petsc_tpu.grid import Grid

        grid = Grid.from_config(cfg)
        mma = MMA(grid.nelem, cfg.m, grid.ne, dt, precise_dots=False)
        span = cfg.Xmax - cfg.Xmin
        L = x - 0.5 * span
        U = x + 0.5 * span
        dfdx = -jnp.ones(shape, dt)
        gx = jnp.zeros((cfg.m,), dt)
        dgdx = jnp.full((cfg.m, *shape), 1.0 / grid.nelem, dt)

        @jax.jit
        def run(x, dfdx, gx, dgdx, L, U):
            xmin, xmax = mma._movelimit_impl(
                x, jnp.asarray(cfg.Xmin, dt), jnp.asarray(cfg.Xmax, dt),
                jnp.asarray(cfg.movlim, dt),
            )
            x_new, L2, U2, lam, y, z = mma._update_impl(
                x, dfdx, gx, dgdx, xmin, xmax, x, x, L, U,
                fresh_asymptotes=True,
            )
            return jnp.max(jnp.abs(x_new - x))

        args = (x, dfdx, gx, dgdx, L, U)
    elif mode in ("grad", "proj"):
        from topopt_in_petsc_tpu.grid import Grid
        from topopt_in_petsc_tpu.opt.filters import DesignFilter

        grid = Grid.from_config(cfg)
        filt = DesignFilter(cfg, grid)
        consts = (filt.Hs, filt._fft_consts)
        beta = jnp.asarray(cfg.beta, dt)
        eta = jnp.asarray(cfg.eta, dt)
        if mode == "grad":
            dfdx = -jnp.ones(shape, dt)
            dgdx = jnp.full((cfg.m, *shape), 1.0 / grid.nelem, dt)

            @jax.jit
            def run(x, dfdx, dgdx, Hs, fc):
                a, b = filt._gradients_impl(
                    x, x, dfdx, dgdx, beta, eta, Hs, fc,
                    projection=False,
                )
                return jnp.max(jnp.abs(a)) + jnp.max(jnp.abs(b))

            args = (x, dfdx, dgdx, consts[0], consts[1])
        else:

            @jax.jit
            def run(x, Hs, fc):
                xT, xP = filt._project_impl(
                    x, beta, eta, Hs, fc, projection=False
                )
                return jnp.max(xP)

            args = (x, consts[0], consts[1])
    elif mode == "obj":
        from topopt_in_petsc_tpu.models.elasticity import LinearElasticity
        from topopt_in_petsc_tpu.grid import Grid

        grid = Grid.from_config(cfg)
        phys = LinearElasticity(cfg, grid)
        op0 = phys._bsolver.op32
        rng = np.random.default_rng(0)
        ub = jnp.asarray(
            rng.standard_normal((3, op0.rows, op0.Lcp)).astype(
                np.float32
            )
        )

        @jax.jit
        def run(x, ub):
            u = op0.from_blocked(ub, phys.dtype)
            fx, gx, dfdx, dgdx = phys._objective_parts(x, u)
            return fx

        args = (x, ub)
    else:
        raise SystemExit(f"unknown mode {mode}")

    for trial in range(2):
        t0 = time.perf_counter()
        v = _sync(run(*args))
        print(
            f"trial {trial}: out={v:.6e}  "
            f"{time.perf_counter() - t0:.2f} s",
            flush=True,
        )


if __name__ == "__main__":
    main()
