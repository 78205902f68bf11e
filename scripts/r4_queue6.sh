#!/usr/bin/env bash
# Round-4 queue, part 6: the verified-ApproxTopK merge landed mid-queue
# (commit 85f95c5) and changes both engines' wall-clock, so the headline
# 10M bound run must be re-measured on the new engine FIRST, and the
# remaining jobs are value-ordered against the round's remaining
# wall-clock (queue-5's tail would have overrun it). Waits for the
# running phase10Mb (pid $1), then runs the remainder. All jobs restart
# cleanly from .bench_cache/ + trained_index/.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  echo "=== [$(date +%H:%M:%S)] queue6 waiting on pid $WAIT_PID (phase10Mb)" \
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

# 1. merge primitive microbench (extends the r3 frontier table)
run_job mergebench 3600 python scripts/merge_bench.py

# 2. HEADLINE re-run on the verified-merge engine (auto dense routing live)
run_job bound10Mc 7200 python -m auncel_tpu.eval_harness.bound synthDeep10M 3000 1000 10 0.10 --storage sq8 --profile-size 1000 --batch-latency 200

# 3. VERDICT #6: default-config compare holds the 1M hard tail (P0)
run_job compare1Mb 7200 python -m auncel_tpu.eval_harness.compare synthHard1M 3000 1000 10 0.10 --profile-size 1000

# 4. Three-way comparison at the reference's headline regime
run_job compare10M 10800 python -m auncel_tpu.eval_harness.compare synthDeep10M 3000 1000 10 0.10 --profile-size 1000 --storage sq8

# 5. VERDICT #3: 1M latency logs + CDF/slowdown figures vs ELP
run_job latfig1M 7200 python scripts/latency_fig.py synthHard1M 2000 1000 10 0.10

# 6. VERDICT #9, 10M half
run_job effErr10Mb 7200 python -m auncel_tpu.eval_harness.effect_error synthDeep10M 3000 1000 10 --storage sq8 --calibrate --profile-size 1000
run_job effTime10Mb 7200 python -m auncel_tpu.eval_harness.effect_time synthDeep10M 2000 1000 10 --storage sq8

# 7. headline bench refresh on the new engine
run_job bench 3600 python bench.py

# 8. VERDICT #7: HNSW at 1M with build-cost accounting
run_job hnsw1M 9000 python scripts/hnsw1M.py

# 9. VERDICT #9, 1M half
run_job effErr1M 3600 python -m auncel_tpu.eval_harness.effect_error synthHard1M 2000 1000 10 --calibrate
run_job effTime1M 3600 python -m auncel_tpu.eval_harness.effect_time synthHard1M 2000 1000 10

# 10. remaining compares (refreshes; lowest value density)
run_job compareH100K 3600 python -m auncel_tpu.eval_harness.compare synthHard100K 2000 1000 10 0.10
run_job compare100K 3600 python -m auncel_tpu.eval_harness.compare synth100K 2000 1000 10 0.10

# 11. Full CPU suite at the tail (single core — never overlap timings)
run_job pytest 5400 python -m pytest tests/ -q

echo "=== [$(date +%H:%M:%S)] QUEUE6 DONE" | tee -a logs_r4/queue.log
