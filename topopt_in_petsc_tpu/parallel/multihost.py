"""Multi-host initialization (the reference's `mpirun -np N` launch,
README.md:29, as single-program multi-host JAX).

On a TPU pod slice, run the same script on every host:

    from topopt_in_petsc_tpu.parallel.multihost import initialize
    initialize()                      # jax.distributed under TPU env vars
    cfg = TopOptConfig(..., mesh_shape=(4, 2, 2))   # product = global chips
    run_topopt(cfg)

The ('x','y','z') device mesh then spans all hosts; the SPMD halo
engine's ppermute plane exchanges ride ICI within a slice and DCN across
slices exactly as laid out by `make_device_mesh` (contiguous blocks of
`jax.devices()` per axis — keep the fastest-varying mesh axis within a
host for ICI-local halos).

Host-side IO (VTU/restart gathers in SpmdDriver) runs on process 0 only.
"""

from __future__ import annotations

import jax


def initialize(**kwargs) -> None:
    """jax.distributed.initialize with TPU auto-detection; no-op when
    single-process."""
    try:
        if jax.process_count() > 1:
            return  # already initialized
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # single-host / no coordinator: fine
        if kwargs:
            raise
        print(f"# multihost: single-process mode ({type(e).__name__})")


def is_primary() -> bool:
    try:
        return jax.process_index() == 0
    except RuntimeError:
        return True
