#!/usr/bin/env bash
# Round-5i (waits for queue_r5h): the giga-dof DRIVER leg — the actual
# CLI (python -m topopt_in_petsc_tpu, FusedDriver) running multi-
# iteration campaigns at 384^3 and 512^3 on one chip.  Probes proved
# the step; this is the user-facing surface doing it (main.cc:54-123
# at scale).  Restart/VTU cadences off: GB-scale host IO rides the
# ~11 MB/s tunnel (tools/probe_xfer.py) and is not the subject.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

while ! grep -q "queue_r5h done" runs/queue_r5h.log 2>/dev/null; do
  sleep 20
done

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r5i.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r5i.log
}

mkdir -p runs/drv384 runs/drv512
run driver_384 2400 python -m topopt_in_petsc_tpu \
    -nx 385 -ny 385 -nz 385 -nlvls 6 -maxItr 5 -fused 1 \
    -restart 0 -output_cadence_vtu 0 -workdir runs/drv384
run driver_512 3000 python -m topopt_in_petsc_tpu \
    -nx 513 -ny 513 -nz 513 -nlvls 6 -smooth_sweeps 2 -maxItr 2 \
    -fused 1 -restart 0 -output_cadence_vtu 0 -workdir runs/drv512

echo "queue_r5i done $(date)" >> runs/queue_r5i.log
