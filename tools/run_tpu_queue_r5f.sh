#!/usr/bin/env bash
# Round-5f chain (waits for queue_r5e): the f32 post-refinement smooth
# at 512^3 (iteration-parity lever with zero stored memory), a rerun of
# the solve-only SPMD probe (programs now cached — the round's first
# timed call read 700 s vs 226-s first-call-incl-compile, so variance
# must be split from systematic engine tax), and a bench warm so the
# driver's end-of-round run hits a hot cache.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

while ! grep -q "queue_r5e done" runs/queue_r5e.log 2>/dev/null; do
  sleep 20
done

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r5f.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r5f.log
}

run probe_512_post1 4200 python tools/probe_512.py 2 1 6 400 bf16 513 0.06 1
run probe_512_post2 4200 python tools/probe_512.py 2 1 6 400 bf16 513 0.06 2
run probe_spmd_512_rerun 3600 python tools/probe_spmd_512.py 512
run bench_r5 7200 python bench.py

echo "queue_r5f done $(date)" >> runs/queue_r5f.log
