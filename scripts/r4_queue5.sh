#!/usr/bin/env bash
# Round-4 queue, part 5: queue-4's driver was stopped after compare1M to
# (a) re-run the crashed phase10M (shape bug at scripts/phase10M.py:131 —
# the eval slice has 1000 queries, B was 1024) and (b) re-run compare1M
# at the P0 disjoint protocol (queue-4 ran it with 1000 calibration
# samples and the default row missed at 0.800; the identical-protocol
# 2000-sample run holds at 10M). Also adds compare10M — the reference's
# headline-regime comparison was missing from the plan. hnsw1M stays
# last (riskiest; bank everything else first). Takes the pid of the
# still-running tune10M as $1 and waits for it before touching the TPU
# (single tunneled chip: one job at a time).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r4

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  echo "=== [$(date +%H:%M:%S)] queue5 waiting on pid $WAIT_PID (tune10M)" \
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

# 1. Phase split + dense decide on the unprunable 10M corpus (VERDICT #2)
run_job phase10Mb 10800 python scripts/phase10M.py

# 2. VERDICT #6: default-config compare holds the 1M hard tail, at the
#    P0 protocol (profile 1000, calibrate on 2000 disjoint)
run_job compare1Mb 7200 python -m auncel_tpu.eval_harness.compare synthHard1M 3000 1000 10 0.10 --profile-size 1000

# 3. VERDICT #3: 1M latency logs + CDF/slowdown figures vs ELP
run_job latfig1M 7200 python scripts/latency_fig.py synthHard1M 2000 1000 10 0.10

# 4. Three-way comparison at the reference's headline regime (new)
run_job compare10M 10800 python -m auncel_tpu.eval_harness.compare synthDeep10M 3000 1000 10 0.10 --profile-size 1000 --storage sq8

# 5. effErr10M rerun at the P0 protocol (interrupted; caches warm)
run_job effErr10Mb 7200 python -m auncel_tpu.eval_harness.effect_error synthDeep10M 3000 1000 10 --storage sq8 --calibrate --profile-size 1000

# 6. effTime10M (killed mid-run when queue-1's session died)
run_job effTime10Mb 7200 python -m auncel_tpu.eval_harness.effect_time synthDeep10M 2000 1000 10 --storage sq8

# 7. headline refresh (caches warm) — banked before the long tail
run_job bench 3600 python bench.py

# 8. VERDICT #9 (1M half) + remaining compares
run_job effErr1M 3600 python -m auncel_tpu.eval_harness.effect_error synthHard1M 2000 1000 10 --calibrate
run_job effTime1M 3600 python -m auncel_tpu.eval_harness.effect_time synthHard1M 2000 1000 10
run_job compareH100K 3600 python -m auncel_tpu.eval_harness.compare synthHard100K 2000 1000 10 0.10
run_job compare100K 3600 python -m auncel_tpu.eval_harness.compare synth100K 2000 1000 10 0.10

# 9. VERDICT #7: HNSW at 1M with build-cost accounting
run_job hnsw1M 10800 python scripts/hnsw1M.py

echo "=== [$(date +%H:%M:%S)] QUEUE5 DONE" | tee -a logs_r4/queue.log
