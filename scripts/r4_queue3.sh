#!/usr/bin/env bash
# Round-4 queue, part 3: everything still pending after queue-1 died
# mid-effTime10M (the driving session ended; run this one under setsid
# so it survives). Same conventions as r4_queue.sh; jobs are idempotent
# via .bench_cache/ + trained_index/ caches.
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

# 1. xover rerun on the disjoint P0 protocol (first run calibrated on
#    profile-seen queries and missed the bound on every cell) — VERDICT #2
run_job xover10Mb 10800 python scripts/xover10M.py

# 2. strict-eps matrix supplement: raised multipler cap (disjoint) +
#    the reference's tuned-on-served-queries protocol, both labeled
run_job matrix10Msupp 10800 python scripts/matrix10M_supp.py

# 3. effErr10M rerun at the P0 protocol (queue-1's buffered command ran
#    ts=2000 -> only 1000 disjoint calibration queries, half the floor)
run_job effErr10Mb 7200 python -m auncel_tpu.eval_harness.effect_error synthDeep10M 3000 1000 10 --storage sq8 --calibrate --profile-size 1000

# 4. effTime10M (killed mid-run when the session died; caches are warm)
run_job effTime10Mb 7200 python -m auncel_tpu.eval_harness.effect_time synthDeep10M 2000 1000 10 --storage sq8

# 5. plan sweep at 10M (RESULTS_r4 placeholder section)
run_job tune10M 7200 python scripts/tune10M.py

# 6. VERDICT #6: default-config compare holds the 1M hard tail
run_job compare1M 7200 python -m auncel_tpu.eval_harness.compare synthHard1M 2000 1000 10 0.10

# 7. VERDICT #3: 1M latency logs + CDF/slowdown figures vs ELP
run_job latfig1M 7200 python scripts/latency_fig.py synthHard1M 2000 1000 10 0.10

# 8. VERDICT #9 (1M half) + remaining compares
run_job effErr1M 3600 python -m auncel_tpu.eval_harness.effect_error synthHard1M 2000 1000 10 --calibrate
run_job effTime1M 3600 python -m auncel_tpu.eval_harness.effect_time synthHard1M 2000 1000 10
run_job compareH100K 3600 python -m auncel_tpu.eval_harness.compare synthHard100K 2000 1000 10 0.10
run_job compare100K 3600 python -m auncel_tpu.eval_harness.compare synth100K 2000 1000 10 0.10

# 9. headline refresh (caches now warm)
run_job bench 3600 python bench.py

# 10. VERDICT #7: HNSW at 1M with build-cost accounting (longest,
#     riskiest job last so everything above is banked first)
run_job hnsw1M 10800 python scripts/hnsw1M.py

echo "=== [$(date +%H:%M:%S)] QUEUE3 DONE" | tee -a logs_r4/queue.log
