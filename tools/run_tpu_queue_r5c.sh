#!/usr/bin/env bash
# Round-5c chain (waits for queue_r5b): bisect the 384^3 fused-tail
# INVALID_ARGUMENT by component — fast repro first (ksp_maxit=4 reaches
# the failing tail in minutes), then the four tail pieces standalone,
# led by the one never isolated before (MMA dual interior point).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

while ! grep -q "queue_r5b done" runs/queue_r5b.log 2>/dev/null; do
  sleep 20
done

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r5c.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r5c.log
}

run probe_fused_384_fast 1800 python tools/probe_fused.py 384 6 same 4
run probe_tail_mma_384 2400 python tools/probe_tail.py mma 384
run probe_tail_grad_384 2400 python tools/probe_tail.py grad 384
run probe_tail_proj_384 2400 python tools/probe_tail.py proj 384
run probe_tail_obj_384 2400 python tools/probe_tail.py obj 384

echo "queue_r5c done $(date)" >> runs/queue_r5c.log
