#!/usr/bin/env bash
# Round-4 queue, part 7: bound10Mc (verified-merge engine, imported
# before the revert landed) read 332.6 qps vs 291.7 — contradicting the
# standalone merge microbench (0.83-0.95x). Controlled A/B needed: run
# the SAME headline protocol on the reverted exact-merge engine (now on
# disk, with the dense-probe observability line) before trusting either
# number. Waits for the running compare10M (pid $1).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  echo "=== [$(date +%H:%M:%S)] queue7 waiting on pid $WAIT_PID (compare10M)" \
    | tee -a logs_r4/queue.log
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] START $name: $*" | tee -a logs_r4/queue.log
  timeout "$tmo" "$@" >"logs_r4/$name.out" 2>"logs_r4/$name.err"
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] END $name rc=$rc" | tee -a logs_r4/queue.log
}

# 1. A/B: headline on the exact-merge engine, same protocol/day
run_job bound10Md 7200 python -m auncel_tpu.eval_harness.bound synthDeep10M 3000 1000 10 0.10 --storage sq8 --profile-size 1000 --batch-latency 200

# 2. VERDICT #3: 1M latency logs + CDF/slowdown figures vs ELP
run_job latfig1M 7200 python scripts/latency_fig.py synthHard1M 2000 1000 10 0.10

# 3. VERDICT #9, 10M half
run_job effErr10Mb 7200 python -m auncel_tpu.eval_harness.effect_error synthDeep10M 3000 1000 10 --storage sq8 --calibrate --profile-size 1000
run_job effTime10Mb 7200 python -m auncel_tpu.eval_harness.effect_time synthDeep10M 2000 1000 10 --storage sq8

# 4. headline bench refresh
run_job bench 3600 python bench.py

# 5. VERDICT #7: HNSW at 1M with build-cost accounting
run_job hnsw1M 9000 python scripts/hnsw1M.py

# 6. VERDICT #9, 1M half
run_job effErr1M 3600 python -m auncel_tpu.eval_harness.effect_error synthHard1M 2000 1000 10 --calibrate
run_job effTime1M 3600 python -m auncel_tpu.eval_harness.effect_time synthHard1M 2000 1000 10

# 7. remaining compares (refreshes; lowest value density)
run_job compareH100K 3600 python -m auncel_tpu.eval_harness.compare synthHard100K 2000 1000 10 0.10
run_job compare100K 3600 python -m auncel_tpu.eval_harness.compare synth100K 2000 1000 10 0.10

# 8. Full CPU suite at the tail (single core — never overlap timings)
run_job pytest 5400 python -m pytest tests/ -q

echo "=== [$(date +%H:%M:%S)] QUEUE7 DONE" | tee -a logs_r4/queue.log
