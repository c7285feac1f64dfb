#!/usr/bin/env bash
# Round-5g chain (waits for queue_r5f): with the donation fix landed
# (no identity-aliased donation in the chunked tail), produce the
# GREEN full-solve 384^3 optimization-iteration artifact, measure the
# host<->device link bandwidth (decides -park_design's viability on
# this tunnel), and retry the full 512^3 iteration (parking + in-init
# E/RHS + real spectrum).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

while ! grep -q "queue_r5f done" runs/queue_r5f.log 2>/dev/null; do
  sleep 20
done

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r5g.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r5g.log
}

run probe_xfer 1200 python tools/probe_xfer.py 512
run probe_fused_384_full 4200 python tools/probe_fused.py 384
run probe_fused_512_full 7200 python tools/probe_fused.py 512

echo "queue_r5g done $(date)" >> runs/queue_r5g.log
