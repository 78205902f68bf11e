#!/usr/bin/env bash
# Round-4 queue, part 5 (revised before any job started): queue-4's
# driver was stopped after compare1M to (a) re-run the crashed phase10M
# (shape bug at scripts/phase10M.py:131 — the eval slice has 1000
# queries, B was 1024), (b) re-run compare1M at the P0 disjoint protocol
# (queue-4 ran it with 1000 calibration samples and the default row
# missed at 0.800; the identical-protocol 2000-sample run holds at 10M),
# and (c) measure DENSE SERVING AT THE HEADLINE CONFIG first — tune10M's
# dense cells read 1.8x over gathers on the prunable corpus, so the
# 291.7 qps headline is likely conceding a large factor to per-query
# gather bytes. hnsw1M stays near-last (riskiest); the CPU pytest suite
# runs at the very end (1 CPU core: it must not overlap timing jobs).
# Takes the pid of the still-running tune10M as $1 and waits for it
# before touching the TPU (single tunneled chip: one job at a time).
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

# 1. Dense serving at the headline config (caches fully warm from
#    tune10M): does the 10M-p2 bound-held number beat 291.7 qps when the
#    serve phase rides the shared corpus pass?
run_job dense10M 5400 python -m auncel_tpu.eval_harness.bound synthDeep10M 3000 1000 10 0.10 --storage sq8 --profile-size 1000 --batch-latency 200 --dense-cut 0.0
run_job dense10Mdd 5400 python -m auncel_tpu.eval_harness.bound synthDeep10M 3000 1000 10 0.10 --storage sq8 --profile-size 1000 --batch-latency 0 --dense-cut 0.0 --dense-decide

# 2. Phase split + dense decide on the unprunable 10M corpus (VERDICT #2)
run_job phase10Mb 10800 python scripts/phase10M.py

# 3. VERDICT #6: default-config compare holds the 1M hard tail, at the
#    P0 protocol (profile 1000, calibrate on 2000 disjoint)
run_job compare1Mb 7200 python -m auncel_tpu.eval_harness.compare synthHard1M 3000 1000 10 0.10 --profile-size 1000

# 4. VERDICT #3: 1M latency logs + CDF/slowdown figures vs ELP
run_job latfig1M 7200 python scripts/latency_fig.py synthHard1M 2000 1000 10 0.10

# 5. Three-way comparison at the reference's headline regime (new)
run_job compare10M 10800 python -m auncel_tpu.eval_harness.compare synthDeep10M 3000 1000 10 0.10 --profile-size 1000 --storage sq8

# 6. effErr10M rerun at the P0 protocol (interrupted; caches warm)
run_job effErr10Mb 7200 python -m auncel_tpu.eval_harness.effect_error synthDeep10M 3000 1000 10 --storage sq8 --calibrate --profile-size 1000

# 7. effTime10M (killed mid-run when queue-1's session died)
run_job effTime10Mb 7200 python -m auncel_tpu.eval_harness.effect_time synthDeep10M 2000 1000 10 --storage sq8

# 8. headline refresh (caches warm) — banked before the long tail
run_job bench 3600 python bench.py

# 9. VERDICT #9 (1M half) + remaining compares
run_job effErr1M 3600 python -m auncel_tpu.eval_harness.effect_error synthHard1M 2000 1000 10 --calibrate
run_job effTime1M 3600 python -m auncel_tpu.eval_harness.effect_time synthHard1M 2000 1000 10
run_job compareH100K 3600 python -m auncel_tpu.eval_harness.compare synthHard100K 2000 1000 10 0.10
run_job compare100K 3600 python -m auncel_tpu.eval_harness.compare synth100K 2000 1000 10 0.10

# 10. VERDICT #7: HNSW at 1M with build-cost accounting
run_job hnsw1M 10800 python scripts/hnsw1M.py

# 11. Full CPU suite at the tail (single core — never overlap timings)
run_job pytest 5400 python -m pytest tests/ -q

echo "=== [$(date +%H:%M:%S)] QUEUE5 DONE" | tee -a logs_r4/queue.log
