#!/usr/bin/env bash
# Round-5b chain (waits for queue_r5a to finish): the 384^3 fused
# iteration with the round-5 code (real-only FFT spectrum), the
# iteration-parity experiment (sweeps=4 under bf16 at 512^3), the
# solve-only SPMD engine probe, and the parked 512^3 fused iteration.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

while ! grep -q "queue_r5a done" runs/queue_r5a.log 2>/dev/null; do
  sleep 20
done

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r5b.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r5b.log
}

run probe_fused_384 4200 python tools/probe_fused.py 384
run probe_512_sweeps4 4200 python tools/probe_512.py 4 1 6 400 bf16 513
run probe_spmd_512 5400 python tools/probe_spmd_512.py 512
run probe_fused_512 7200 python tools/probe_fused.py 512

echo "queue_r5b done $(date)" >> runs/queue_r5b.log
