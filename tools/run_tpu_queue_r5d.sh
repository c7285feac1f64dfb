#!/usr/bin/env bash
# Round-5d chain (waits for queue_r5c): structural variants of the
# failing 384^3 fused tail, all with the fast ksp_maxit=4 repro —
# donation-free, split-tail, and split-tail+donation-free.  Whatever
# the r5c component bisection says, one of these either lands a green
# 384^3 iteration or pins the failing structure.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

while ! grep -q "queue_r5c done" runs/queue_r5c.log 2>/dev/null; do
  sleep 20
done

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r5d.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r5d.log
}

run probe_fused_384_nodonate 2400 env TOPOPT_NO_DONATE_TAIL=1 \
    python tools/probe_fused.py 384 6 same 4
run probe_fused_384_split 2400 python tools/probe_fused.py 384 6 same 4 1
run probe_fused_384_split_nodonate 2400 env TOPOPT_NO_DONATE_TAIL=1 \
    python tools/probe_fused.py 384 6 same 4 1

echo "queue_r5d done $(date)" >> runs/queue_r5d.log
