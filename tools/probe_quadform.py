"""Isolate the Pallas u^T KE u quadform at a given node count.

The 384^3 fused-iteration probe failed with a runtime INVALID_ARGUMENT
*after* its host-chunked solve completed — the post-solve tail program
is the suspect, and the Pallas quadform is its only kernel that has
never run above 257^3 on hardware.  Usage:
    python tools/probe_quadform.py [n_nodes=385] [xla01=0]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from topopt_in_petsc_tpu.models.elements import hex8_stiffness  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 385
    use_xla = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    ne = n - 1
    KE = hex8_stiffness(2.0 / ne, 1.0 / ne, 1.0 / ne, 0.3)
    rng = np.random.default_rng(0)
    u = jnp.asarray(
        rng.standard_normal((n, n, n, 3)).astype(np.float32)
    )
    if use_xla:
        from topopt_in_petsc_tpu.ops.hex_operator import (
            element_quadratic_form,
        )

        KEj = jnp.asarray(KE, jnp.float32)
        f = jax.jit(lambda u: element_quadratic_form(u, KEj))
    else:
        from topopt_in_petsc_tpu.ops.pallas_hex import (
            make_pallas_quadform,
        )

        qf = make_pallas_quadform((n, n, n), KE)
        f = jax.jit(qf)
    for trial in range(2):
        t0 = time.perf_counter()
        out = f(u)
        v = float(jnp.sum(out, dtype=jnp.float64))
        print(
            f"trial {trial}: sum(qf)={v:.6e}  "
            f"{time.perf_counter() - t0:.2f} s",
            flush=True,
        )


if __name__ == "__main__":
    main()
