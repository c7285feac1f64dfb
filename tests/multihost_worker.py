"""Worker for the REAL multi-host test (tests/test_multihost.py).

Runs one process of an N-process jax.distributed CPU job: a tiny SPMD
cantilever through the full SpmdDriver (collective podio gathers, VTU +
.dat + restart cadences) over a device mesh spanning both processes —
the pod execution model of the reference's `mpirun -np N ./topopt`
(README.md:29), minus the physical second host.

Invoked as:
  python tests/multihost_worker.py <pid> <nprocs> <port> <workdir>
with JAX_PLATFORMS=cpu / XLA_FLAGS=--xla_force_host_platform_device_count=4
set by the parent (sitecustomize runs before main(), so env must come
from the command line).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = int(sys.argv[3])
    workdir = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else ""
    resume = mode == "resume"
    blocked = mode == "blocked"

    import jax

    jax.config.update("jax_enable_x64", True)  # match tests/conftest.py
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 8  # global mesh spans both processes
    assert len(jax.local_devices()) == 8 // nprocs

    from topopt_in_petsc_tpu.config import TopOptConfig
    from topopt_in_petsc_tpu.parallel.spmd_driver import SpmdDriver

    kw = dict(
        nx=17, ny=9, nz=9, nlvls=2, rmin=0.16,
        dtype="float64", workdir=workdir, mesh_shape=(2, 2, 2),
        output_cadence_vtu=True, output_dat=True, restart=True,
    )
    if resume:
        # multi-host restart LOAD: every process reads the checkpoint,
        # put_blocked places only its addressable blocks
        # (TopOpt.cc:514-570's multi-rank reload)
        from topopt_in_petsc_tpu.io.restart import RestartManager

        latest = RestartManager(workdir).latest()
        assert latest is not None
        kw.update(maxItr=3, restartFileVec=latest, output_dat=False)
    elif blocked:
        # the zero-storage blocked-resident engine (masks/weights/RHS
        # as axis_index-gated predicates) across REAL process
        # boundaries; f32 (the blocked kernel stack's dtype)
        kw.update(
            maxItr=2, dtype="float32", operator_impl="blocked",
            output_dat=False, output_cadence_vtu=False, restart=False,
        )
    else:
        kw.update(maxItr=2)
    cfg = TopOptConfig(**kw)
    cfg.validate()
    d = SpmdDriver(cfg)
    if resume:
        assert d.itr == 2, f"expected resume at itr 2, got {d.itr}"
    hist = d.run()
    tag = f"{mode}_" if mode else ""
    with open(os.path.join(workdir, f"{tag}hist{pid}.json"), "w") as f:
        json.dump({"fx": hist["fx"], "gx": hist["gx"]}, f)
    print(f"worker {pid}: done, fx={hist['fx']}", flush=True)


if __name__ == "__main__":
    main()
