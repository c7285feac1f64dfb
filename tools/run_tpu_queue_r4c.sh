#!/usr/bin/env bash
# Round-4c TPU backlog, reordered: giga-dof fused iterations (VERDICT
# r3 item 3) first, then the mixed-precision V-cycle experiment (item
# 7), the pod-path overhead probe (item 6), and bf16 fine-smoothing
# (item 7 alt).  Pass a PID as $1 to wait for a running stage first.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r4c.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r4c.log
}

run probe_fused_384 4800 python tools/probe_fused.py 384
run probe_512_mixed 4800 python tools/probe_512.py 2 1 6 400 mixed 513
run probe_fused_512 5400 python tools/probe_fused.py 512
run probe_spmd_512 5400 python tools/probe_spmd_512.py 512
run probe_512_bf16_s3 3600 python tools/probe_512.py 3 1 6 400 bf16 513

echo "queue_r4c done $(date)" >> runs/queue_r4c.log
