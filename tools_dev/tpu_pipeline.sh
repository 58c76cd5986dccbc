#!/bin/bash
# Round-3 TPU pipeline — run the moment the axon tunnel answers.
#
#   tools_dev/tpu_pipeline.sh phase1   # sweep ablation + stress scaling
#   tools_dev/tpu_pipeline.sh phase2   # bench.py + bench_scenes + precision
#
# Phase 1 output -> /tmp/tpu_phase1.log (pick the winning mode, set
# KernelOptions defaults, commit), then phase 2 refreshes the committed
# artifacts (BENCH_SCENES.json, PRECISION.json) with the new defaults.
# NEVER run two processes against the chip at once: every step below is
# serialized in this one script.
set -u
cd "$(dirname "$0")/.."

run() {  # run "label" cmd...: keep going on failure but SAY so loudly
  local label="$1"; shift
  "$@"; local rc=$?
  if [ $rc -ne 0 ]; then
    echo "### STEP FAILED: $label (rc=$rc) — results above are PARTIAL"
  else
    echo "### step ok: $label"
  fi
  return 0
}

phase1() {
  echo "=== sweep ablation ($(date)) ==="
  run "sweep ablation" env \
    SB_MODES=default,box,pair,box-pair,box-pair-un8,box-pair-bf3,box-pair-bf4,box-pair-bf6,box-bf4,pair-bf4,box-bw4,box-bw4c,box-bw8c,box-pair-bw3c,box-pair-bw4,box-pair-bw4c,box-pair-bw6c,pair-bw4c,box-pair-cull2-un8,box-pair-cull4-un8,un8,pair-un6,box-norounds,pair-norounds,g4-norounds,g4-nosieve,box-g8,box-g8-pair \
    SB_CELLS=512 timeout 5400 python tools_dev/sweep_bench.py
  echo "=== stress scenes ==="
  run "gen_stress" python tools_dev/gen_stress.py 2
  run "stress sweep" env SB_SCENE=/tmp/stress-4x.json SB_CELLS=256 \
    SB_MODES=mxu,default,box-pair-bf4,box-pair-bw4c \
    timeout 3600 python tools_dev/sweep_bench.py
}

phase2() {
  echo "=== bench.py ($(date)) ==="
  run "bench.py" bash -c 'timeout 1800 python bench.py | tee /tmp/bench_r3.json'
  echo "=== bench_scenes ==="
  run "bench_scenes" timeout 5400 python tools_dev/bench_scenes.py
  echo "=== precision audit ==="
  run "precision audit" timeout 5400 python tools_dev/precision_audit.py
}

case "${1:-phase1}" in
  phase1) phase1 2>&1 | tee /tmp/tpu_phase1.log ;;
  phase2) phase2 2>&1 | tee /tmp/tpu_phase2.log ;;
  *) echo "usage: $0 phase1|phase2" >&2; exit 2 ;;
esac
