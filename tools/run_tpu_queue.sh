#!/usr/bin/env bash
# The TPU backlog, in priority order (VERDICT r3 items 1-3, 6-8),
# one process at a time (only ONE process may touch the chip).  Run
# from /root/repo when the tunnel is up:
#
#   bash tools/run_tpu_queue.sh [--skip-campaign]
#
# Each stage logs into runs/ and continues past failures (a later
# stage may still succeed).  Stage order puts the driver-contract
# bench first: warm_512/solve_512 green is round 4's #1 deliverable
# (the round-3 donation OOM is fixed — models/elasticity builds the
# chunked warm start directly in the kernel layout).
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

# 1. the driver-contract benchmark (all six stages, JSON on stdout)
run bench_r4 5400 python bench.py

# 2. the 200-iteration production campaign at 256^3 (VERDICT item 2)
if [ "$SKIP_CAMPAIGN" != "--skip-campaign" ]; then
  run campaign256 14400 bash tools/run_campaign256.sh runs/prod256
fi

# 3. giga-dof full optimization iteration (VERDICT item 3)
run probe_fused_384 3600 python tools/probe_fused.py 384
run probe_fused_512 5400 python tools/probe_fused.py 512

# 4. pod-path overhead probe at 405M dof (VERDICT item 6)
run probe_spmd_512 5400 python tools/probe_spmd_512.py 512

# 5. bf16 V-cycle iteration-count experiment (VERDICT item 7):
#    stronger fine smoothing under bf16 storage, judged on the
#    time*iterations product vs the sweeps=2 baseline
run probe_512_bf16_s3 3600 python tools/probe_512.py 3 1 6 400 bf16 513
run probe_512_bf16_s4 3600 python tools/probe_512.py 4 1 6 400 bf16 513

echo "queue done ($(date))" | tee -a "runs/queue.log"
