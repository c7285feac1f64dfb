#!/usr/bin/env bash
# Round-5e chain (waits for queue_r5d): iteration-parity experiments at
# 512^3 that fit the bf16 memory envelope — Chebyshev band narrowing
# (degree 2 over [0.06,1.1] is an unusually wide band; hypre/PETSc use
# 0.1-0.3 lower bounds at low degree) and a degree-3 middle point.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

while ! grep -q "queue_r5d done" runs/queue_r5d.log 2>/dev/null; do
  sleep 20
done

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r5e.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r5e.log
}

run probe_512_cheby25 4200 python tools/probe_512.py 2 1 6 400 bf16 513 0.25
run probe_512_cheby15 4200 python tools/probe_512.py 2 1 6 400 bf16 513 0.15
run probe_512_sweeps3 4200 python tools/probe_512.py 3 1 6 400 bf16 513

echo "queue_r5e done $(date)" >> runs/queue_r5e.log
