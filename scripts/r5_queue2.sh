#!/usr/bin/env bash
# Round-5 queue, part 2 — the batch-1 decide-plan A/B at 10M (VERDICT #1)
# plus the reworked time-budget validation. Runs after queue1 (warm10M
# populated the 10M caches). The latfig/matrix/stream/merge jobs follow in
# queue3 once the lat_b1 winner fixes the default plan config.
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

run_job latB1_10M 7200 python scripts/lat_b1.py
run_job effTime1M 5400 python -m auncel_tpu.eval_harness.effect_time synthHard1M 2000 1000 10
run_job effTime10M 7200 python -m auncel_tpu.eval_harness.effect_time synthDeep10M 3000 1000 10 --storage sq8

echo "=== [$(date +%H:%M:%S)] QUEUE2 DONE" | tee -a logs_r5/queue.log
