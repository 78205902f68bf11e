#!/usr/bin/env bash
# Round-5 queue, part 1 — VERDICT r4 #5/#6 queue discipline: the jobs
# that were starved in round 4 run FIRST, before any perf rerun.
#   1. hnsw1M           (starved nine times in round 4 — runs first)
#   2. warm10M          (populate .bench_cache/trained_index for the 10M
#                        jobs every later queue needs)
#   3. effErr1M / effTime1M / compare*100K (the unrun 1M/100K stragglers)
# The full pytest suite runs as a SEPARATE parallel task (CPU-only; this
# queue owns the TPU).
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

run_job hnsw1M 10800 python scripts/hnsw1M.py
run_job warm10M 3600 python scripts/warm10M.py
run_job effErr1M 5400 python -m auncel_tpu.eval_harness.effect_error synthHard1M 2000 1000 10 --calibrate
run_job compareH100K 3600 python -m auncel_tpu.eval_harness.compare synthHard100K 2000 1000 10 0.10
run_job compare100K 3600 python -m auncel_tpu.eval_harness.compare synth100K 2000 1000 10 0.10
# effTime1M moved to queue2: it must measure the REWORKED per-wave cost
# model (VERDICT #2), not the rejected per-probe one.

echo "=== [$(date +%H:%M:%S)] QUEUE1 DONE" | tee -a logs_r5/queue.log
