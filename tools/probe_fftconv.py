"""Isolate the FFT density-filter conv at a given ELEMENT count.

Second suspect for the 384^3 fused-tail INVALID_ARGUMENT (with
tools/probe_quadform.py): the zero-padded transform size at 384^3 is
444^3 (prime factor 37) — first hardware run of that size class.
Usage: python tools/probe_fftconv.py [ne=384] [rmin=0.08]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from topopt_in_petsc_tpu.opt.filters import (  # noqa: E402
    build_filter_kernel,
    filter_stencil_halfwidth,
)
from topopt_in_petsc_tpu.ops.conv_filter import make_fft_conv  # noqa: E402


def main():
    ne = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    rmin = float(sys.argv[2]) if len(sys.argv) > 2 else 0.08
    h = (2.0 / ne, 1.0 / ne, 1.0 / ne)
    n = ne + 1
    s = filter_stencil_halfwidth(rmin, h, (n, n, n))
    k = build_filter_kernel(rmin, h, s)
    print(f"ne={ne}, s={s}, fft size={(ne + 2 * s)}^3", flush=True)
    conv = make_fft_conv((ne, ne, ne), k, jnp.float32)
    f = jax.jit(conv)
    x = jnp.full((ne, ne, ne), 0.5, jnp.float32)
    for trial in range(2):
        t0 = time.perf_counter()
        out = f(x, conv.consts)
        v = float(jnp.sum(out, dtype=jnp.float64))
        print(
            f"trial {trial}: sum={v:.6e}  "
            f"{time.perf_counter() - t0:.2f} s",
            flush=True,
        )


if __name__ == "__main__":
    main()
