#!/usr/bin/env bash
# Round-4 TPU measurement queue (VERDICT items 2,3,4,6,7,9) — sequential,
# one job at a time on the single axon chip; per-job stderr goes to
# logs_r4/<job>.err. Jobs are idempotent: dataset/index/GT caches live in
# .bench_cache/ + trained_index/, so a rerun after a failure resumes
# where the caches left off.
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

# 1. VERDICT #3 + #1 refresh: 10M-p2 bound + per-query latency on the
#    current engine (disjoint P0 protocol: profile 1000, calibrate 2000)
run_job bound10M 10800 python -m auncel_tpu.eval_harness.bound \
  synthDeep10M 3000 1000 10 0.10 --storage sq8 --profile-size 1000 \
  --batch-latency 200

# 2. VERDICT #2: dense-scan crossover measured on the unprunable 10M corpus
run_job xover10M 10800 python scripts/xover10M.py

# 3. VERDICT #4: full k x eps matrix at 10M-p2
run_job matrix10M 10800 python scripts/matrix10M.py

# 4. VERDICT #9 (10M half): effectiveness experiments at 10M-p2
run_job effErr10M 7200 python -m auncel_tpu.eval_harness.effect_error synthDeep10M 3000 1000 10 --storage sq8 --calibrate --profile-size 1000
run_job effTime10M 7200 python -m auncel_tpu.eval_harness.effect_time synthDeep10M 2000 1000 10 --storage sq8

# 5. plan sweep at 10M (RESULTS_r4 placeholder)
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

# 10. VERDICT #7: HNSW at 1M with build-cost accounting (longest, riskiest
#     job last so everything above is already banked if it blows the box)
run_job hnsw1M 10800 python scripts/hnsw1M.py

# 11. xover rerun on the disjoint P0 protocol (first run calibrated on
#     profile-seen queries and missed the bound on every cell)
run_job xover10Mb 10800 python scripts/xover10M.py

# 12. strict-eps matrix supplement: raised multipler cap (disjoint) +
#     the reference's own tuned-on-served-queries protocol, both labeled
run_job matrix10Msupp 10800 python scripts/matrix10M_supp.py

echo "=== [$(date +%H:%M:%S)] QUEUE DONE" | tee -a logs_r4/queue.log
