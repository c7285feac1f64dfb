#!/usr/bin/env bash
# The round-3 TPU backlog, in priority order (VERDICT r2 items 1-3),
# one process at a time (only ONE process may touch the chip).  Run
# from /root/repo when the tunnel is back:
#
#   bash tools/run_tpu_queue.sh [--skip-campaign]
#
# Each stage logs into runs/ and continues past failures (a later
# stage may still succeed).  Stage order puts the driver-contract
# bench first: a green bench.py is round 3's #1 deliverable.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
SKIP_CAMPAIGN="${1:-}"

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date)) ===" | tee -a "runs/queue.log"
  timeout "$tmo" "$@" 2>&1 | tee "runs/${name}.log" | tail -20
  echo "=== $name rc=$? ===" | tee -a "runs/queue.log"
}

# 1. the driver-contract benchmark (all five stages, JSON on stdout)
run bench_r3 4200 python bench.py

# 2. giga-dof full optimization iteration (VERDICT item 3)
run probe_fused_384 3600 python tools/probe_fused.py 384
run probe_fused_512 5400 python tools/probe_fused.py 512

# 3. the 200-iteration production campaign at 256^3 (VERDICT item 2)
if [ "$SKIP_CAMPAIGN" != "--skip-campaign" ]; then
  run campaign256 14400 bash tools/run_campaign256.sh runs/prod256
fi

# 4. pod-path overhead probe at 405M dof (round-3 engine changes)
run probe_spmd_512 5400 python tools/probe_spmd_512.py 512

echo "queue done ($(date))" | tee -a "runs/queue.log"
