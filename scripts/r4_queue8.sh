#!/usr/bin/env bash
# Round-4 queue, part 8: adds the 10M per-query latency comparison
# (latfig10M) — compare10M showed bulk-batch dense ELP wins throughput
# at 10M, so the per-query latency regime (the reference's own headline
# metric, figures 10-12) is where bounded search must be measured
# head-to-head. Waits for the running bound10Md (pid $1).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  echo "=== [$(date +%H:%M:%S)] queue8 waiting on pid $WAIT_PID (bound10Md)" \
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

# 1. VERDICT #3: 1M latency logs + CDF/slowdown figures vs ELP
run_job latfig1M 7200 python scripts/latency_fig.py synthHard1M 2000 1000 10 0.10

# 2. Per-query latency at the headline scale (P0 protocol), fair ELP
#    (batch-aware routing: B=1 never pays a corpus pass)
run_job latfig10M 7200 python scripts/latency_fig.py synthDeep10M 3000 1000 10 0.10 sq8 200 1000

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

echo "=== [$(date +%H:%M:%S)] QUEUE8 DONE" | tee -a logs_r4/queue.log
