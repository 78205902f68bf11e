#!/usr/bin/env bash
# Round-4 queue, part 9: (a) bound10Me confirms the split merge config
# (verified ladder + exact dense) at the headline protocol after the
# 332.6-vs-294.5 A/B; (b) latfig1M re-runs at the P0 floor — its first
# run calibrated on 1000 samples and the auncel row missed the bound
# (0.800), which invalidates the figure. Waits on latfig10M (pid $1).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  echo "=== [$(date +%H:%M:%S)] queue9 waiting on pid $WAIT_PID (latfig10M)" \
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

run_job bound10Me 7200 python -m auncel_tpu.eval_harness.bound synthDeep10M 3000 1000 10 0.10 --storage sq8 --profile-size 1000 --batch-latency 200
run_job latfig1Mb 7200 python scripts/latency_fig.py synthHard1M 3000 1000 10 0.10 f32 200 1000
run_job effErr10Mb 7200 python -m auncel_tpu.eval_harness.effect_error synthDeep10M 3000 1000 10 --storage sq8 --calibrate --profile-size 1000
run_job effTime10Mb 7200 python -m auncel_tpu.eval_harness.effect_time synthDeep10M 2000 1000 10 --storage sq8
run_job bench 3600 python bench.py
run_job hnsw1M 9000 python scripts/hnsw1M.py
run_job effErr1M 3600 python -m auncel_tpu.eval_harness.effect_error synthHard1M 2000 1000 10 --calibrate
run_job effTime1M 3600 python -m auncel_tpu.eval_harness.effect_time synthHard1M 2000 1000 10
run_job compareH100K 3600 python -m auncel_tpu.eval_harness.compare synthHard100K 2000 1000 10 0.10
run_job compare100K 3600 python -m auncel_tpu.eval_harness.compare synth100K 2000 1000 10 0.10
run_job pytest 5400 python -m pytest tests/ -q

echo "=== [$(date +%H:%M:%S)] QUEUE9 DONE" | tee -a logs_r4/queue.log
