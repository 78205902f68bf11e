#!/usr/bin/env bash
# Round-4 queue, part 2: jobs added after the first queue launched (bash
# buffers a small script at exec, so edits to a running r4_queue.sh are
# invisible to it). Same conventions as r4_queue.sh.
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
#    profile-seen queries and missed the bound on every cell)
run_job xover10Mb 10800 python scripts/xover10M.py

# 2. strict-eps matrix supplement: raised multipler cap (disjoint) +
#    the reference's own tuned-on-served-queries protocol, both labeled
run_job matrix10Msupp 10800 python scripts/matrix10M_supp.py

# 3. effErr10M rerun at the P0 protocol (queue-1's buffered command ran
#    ts=2000 -> only 1000 disjoint calibration queries, half the floor)
run_job effErr10Mb 7200 python -m auncel_tpu.eval_harness.effect_error synthDeep10M 3000 1000 10 --storage sq8 --calibrate --profile-size 1000

echo "=== [$(date +%H:%M:%S)] QUEUE2 DONE" | tee -a logs_r4/queue.log
