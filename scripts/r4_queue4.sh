#!/usr/bin/env bash
# Round-4 queue, part 4: queue-3 was stopped mid-effErr10Mb to pull the
# phase-split / dense-decide measurement (scripts/phase10M.py) to the
# front — it is the round's headline perf claim and must not wait ~6 h
# behind the 1M/100K tail. Every interrupted job restarts cleanly from
# .bench_cache/ + trained_index/. hnsw1M stays last (riskiest; bank
# everything else first).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] START $name: $*" | tee -a logs_r4/queue.log
  timeout "$tmo" "$@" >"logs_r4/$name.out" 2>"logs_r4/$name.err"
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] END $name rc=$rc" | tee -a logs_r4/queue.log
}

# 1. Phase split + dense decide on the unprunable 10M corpus (VERDICT #2)
run_job phase10M 10800 python scripts/phase10M.py

# 2. VERDICT #6: default-config compare holds the 1M hard tail
run_job compare1M 7200 python -m auncel_tpu.eval_harness.compare synthHard1M 2000 1000 10 0.10

# 3. Plan sweep at 10M (RESULTS_r4 placeholder section)
run_job tune10M 7200 python scripts/tune10M.py

# 4. VERDICT #3: 1M latency logs + CDF/slowdown figures vs ELP
run_job latfig1M 7200 python scripts/latency_fig.py synthHard1M 2000 1000 10 0.10

# 5. effErr10M rerun at the P0 protocol (interrupted; caches warm)
run_job effErr10Mb 7200 python -m auncel_tpu.eval_harness.effect_error synthDeep10M 3000 1000 10 --storage sq8 --calibrate --profile-size 1000

# 6. effTime10M (killed mid-run when queue-1's session died)
run_job effTime10Mb 7200 python -m auncel_tpu.eval_harness.effect_time synthDeep10M 2000 1000 10 --storage sq8

# 7. VERDICT #9 (1M half) + remaining compares
run_job effErr1M 3600 python -m auncel_tpu.eval_harness.effect_error synthHard1M 2000 1000 10 --calibrate
run_job effTime1M 3600 python -m auncel_tpu.eval_harness.effect_time synthHard1M 2000 1000 10
run_job compareH100K 3600 python -m auncel_tpu.eval_harness.compare synthHard100K 2000 1000 10 0.10
run_job compare100K 3600 python -m auncel_tpu.eval_harness.compare synth100K 2000 1000 10 0.10

# 8. headline refresh (caches now warm)
run_job bench 3600 python bench.py

# 9. VERDICT #7: HNSW at 1M with build-cost accounting
run_job hnsw1M 10800 python scripts/hnsw1M.py

echo "=== [$(date +%H:%M:%S)] QUEUE4 DONE" | tee -a logs_r4/queue.log
