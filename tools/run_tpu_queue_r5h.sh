#!/usr/bin/env bash
# Round-5h chain (waits for queue_r5g): finish the band sweep (0.30,
# 0.35) and the combo (0.25 band + degree-1 f32 refinement), then
# refresh the bench so the driver's end-of-round run hits a hot cache
# with the final recipe (auto cheby_lower=0.25).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

while ! grep -q "queue_r5g done" runs/queue_r5g.log 2>/dev/null; do
  sleep 20
done

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r5h.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r5h.log
}

run probe_512_cheby30 4200 python tools/probe_512.py 2 1 6 400 bf16 513 0.30
run probe_512_cheby35 4200 python tools/probe_512.py 2 1 6 400 bf16 513 0.35
run probe_512_c25post1 4200 python tools/probe_512.py 2 1 6 400 bf16 513 0.25 1
run bench_r5_final 9000 python bench.py

echo "queue_r5h done $(date)" >> runs/queue_r5h.log
