"""Isolate the blocked->nodal layout conversion at a given node count.

Third suspect for the 384^3 fused-tail INVALID_ARGUMENT (after
tools/probe_quadform.py and tools/probe_fftconv.py): the chunked fused
tail converts the solver-layout solution to nodal INSIDE the tail
program (fused_step.py u_blocked=True) — first hardware run of
from_blocked at giga-dof sizes inside a consuming program.
Usage: python tools/probe_fromblocked.py [n_nodes=385]
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
from topopt_in_petsc_tpu.ops.blocked_hex import BlockedHexOperator  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 385
    ne = n - 1
    KE = hex8_stiffness(2.0 / ne, 1.0 / ne, 1.0 / ne, 0.3)
    op = BlockedHexOperator((n, n, n), KE, dof=3)
    rng = np.random.default_rng(0)
    vb = jnp.asarray(
        rng.standard_normal((3, op.rows, op.Lcp)).astype(np.float32)
    )

    @jax.jit
    def roundtrip_sum(vb):
        u = op.from_blocked(vb)
        # consume the nodal field like the tail does (reduce)
        return jnp.sum(u, dtype=jnp.float64)

    for trial in range(2):
        t0 = time.perf_counter()
        v = float(roundtrip_sum(vb))
        print(
            f"trial {trial}: sum={v:.6e}  "
            f"{time.perf_counter() - t0:.2f} s",
            flush=True,
        )


if __name__ == "__main__":
    main()
