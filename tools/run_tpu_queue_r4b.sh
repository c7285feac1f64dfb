#!/usr/bin/env bash
# Round-4 remaining TPU backlog (VERDICT r3 items 3, 6, 7), chained
# after the currently-running probe_fused 384 (pass its PID as $1).
# One process at a time on the chip; each stage logs into runs/ and
# continues past failures.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r4b.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r4b.log
}

# giga-dof full optimization iteration (VERDICT item 3, 512^3 leg)
run probe_fused_512 5400 python tools/probe_fused.py 512

# mixed-precision V-cycle at 512^3 (VERDICT item 7, new mode)
run probe_512_mixed 4800 python tools/probe_512.py 2 1 6 400 mixed 513

# pod-path overhead probe at 405M dof (VERDICT item 6)
run probe_spmd_512 5400 python tools/probe_spmd_512.py 512

# stronger fine smoothing under bf16 storage (VERDICT item 7 alt)
run probe_512_bf16_s3 3600 python tools/probe_512.py 3 1 6 400 bf16 513

echo "queue_r4b done $(date)" >> runs/queue_r4b.log
