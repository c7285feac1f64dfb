#!/usr/bin/env bash
# Round-4d chain: after the running mixed-mode probe (PID $1), re-run
# the fused probes with the scalar-sync fix (384^3 programs are now
# cached), then the pod-path probe, then re-warm/refresh the bench
# artifact so the round-end driver bench hits a hot cache.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r4d.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r4d.log
}

run probe_fused_384 3600 python tools/probe_fused.py 384
run probe_fused_512 5400 python tools/probe_fused.py 512
run probe_spmd_512 5400 python tools/probe_spmd_512.py 512
run bench_r4b 5400 python bench.py

echo "queue_r4d done $(date)" >> runs/queue_r4d.log
