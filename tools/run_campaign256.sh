#!/usr/bin/env bash
# BASELINE #5 / VERDICT r2 item 2: the 200-iteration production
# campaign at 256^3 elements (257^3 nodes, 51M dof) on one TPU chip,
# through the fused driver (solve + filter + MMA as compiled programs,
# host cadences for VTU/restart), with the run log captured for
# docs/PERFORMANCE.md and tools/summarize_run.py.
#
# Usage: bash tools/run_campaign256.sh [workdir]
set -u
WORKDIR="${1:-runs/prod256}"
mkdir -p "$WORKDIR"
cd "$(dirname "$0")/.."
echo "campaign: 257^3, nlvls=5, maxItr=200 -> $WORKDIR" >&2
# field output rides the reference-format .dat stream (MPIIO.cc:147-205
# parity; ~0.4 GB/snapshot vs ~2 GB/base64-.vtu at this size) — convert
# offline with tools/bin2vtu.py like the reference's bin2vtu_v3.py
python -m topopt_in_petsc_tpu \
    -nx 257 -ny 257 -nz 257 -nlvls 5 -maxItr 200 \
    -fused 1 -output_dat 1 -output_cadence_vtu 0 \
    -workdir "$WORKDIR" \
    2>&1 | tee "$WORKDIR/run.log"
python tools/summarize_run.py "$WORKDIR/run.log" | tee "$WORKDIR/summary.txt"
# golden trajectory gate (docs/GOLDEN_RUN.md): non-zero exit on breach
python tools/compare_history.py \
    "$WORKDIR/history.npz" docs/golden_history_257x257x257.npz \
    | tee "$WORKDIR/golden_gate.txt"
exit "${PIPESTATUS[0]}"
