#!/usr/bin/env bash
# Round-5a chain: run the three round-4 isolation probes (committed but
# never executed — VERDICT r4 Missing #1) to bisect the 384^3 fused-tail
# INVALID_ARGUMENT: Pallas quadform, XLA quadform, FFT conv at the 444^3
# transform size, and the blocked->nodal layout conversion.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date)" >> runs/queue_r5a.log
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" >> runs/queue_r5a.log
}

run probe_quadform_385 1800 python tools/probe_quadform.py 385
run probe_quadform_385_xla 1800 python tools/probe_quadform.py 385 1
run probe_fftconv_384 1800 python tools/probe_fftconv.py 384
run probe_fromblocked_385 1800 python tools/probe_fromblocked.py 385

echo "queue_r5a done $(date)" >> runs/queue_r5a.log
