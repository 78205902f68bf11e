#!/usr/bin/env bash
# Round-5 queue, part 3 — the committed headline artifacts on the FINAL
# engine config: the 10M per-query head-to-head (VERDICT #1), the k x eps
# matrix with the exact-top-k margin (VERDICT #4), and the variance-aware
# merge A/B with per-rep 10M stream qps (VERDICT #3 + #7). The full pytest
# suite runs as a SEPARATE parallel CPU task (this queue owns the TPU).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r5

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] START $name: $*" | tee -a logs_r5/queue.log
  timeout "$tmo" "$@" >"logs_r5/$name.out" 2>"logs_r5/$name.err"
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] END $name rc=$rc" | tee -a logs_r5/queue.log
}

run_job latfig10M 7200 python scripts/latency_fig.py synthDeep10M 3000 1000 10 0.10 sq8 200 1000
run_job matrix10M 14400 python scripts/matrix10M.py
bash scripts/merge_ab.sh

echo "=== [$(date +%H:%M:%S)] QUEUE3 DONE" | tee -a logs_r5/queue.log
