#!/usr/bin/env bash
# Round-5 VERDICT #3, reduced form: variance-aware merge-engine A/B on the
# 1M headline bench only. The full interleaved 10M+1M protocol
# (merge_ab.sh) costs ~2.5 h on this stack; when the round's wall clock
# cannot fit it, interleaved reps of the 1M bench still settle the claim
# that round 4 left open there (the -7% stream regression on the split
# config landed at 1M, not 10M). Arms share warmed caches; each runs in
# its own subprocess (AUNCEL_LADDER_MERGE is read at import).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r5

REPS="${MERGE_AB_REPS:-3}"
for rep in $(seq 1 "$REPS"); do
  for arm in verified exact; do
    echo "=== [$(date +%H:%M:%S)] merge_ab_1m rep=$rep arm=$arm" \
      | tee -a logs_r5/queue.log
    AUNCEL_LADDER_MERGE=$arm timeout 3600 python bench.py \
      > "logs_r5/ab1M_${arm}_${rep}.out" \
      2> "logs_r5/ab1M_${arm}_${rep}.err"
    echo "=== [$(date +%H:%M:%S)] merge_ab_1m rep=$rep arm=$arm rc=$?" \
      | tee -a logs_r5/queue.log
  done
done
echo "=== [$(date +%H:%M:%S)] MERGE_AB_1M DONE" | tee -a logs_r5/queue.log
