#!/usr/bin/env bash
# Round-5 VERDICT #3: variance-aware merge-engine A/B.
#
# >= 3 INTERLEAVED repeats per arm (verified vs exact ladder merges) of
# BOTH the 10M headline command and the 1M bench. Interleaving spreads the
# axon compile/tunnel lottery evenly across arms; the round-4 default was
# picked from single runs of a +-10% measurement, which cannot separate a
# real regime effect from that lottery. Each arm runs in its own
# subprocess (AUNCEL_LADDER_MERGE is read at import).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs_r5

# Hard deadline (epoch seconds, override via MERGE_AB_DEADLINE): the
# driver's end-of-round bench.py must find the TPU idle — a rep that
# would start after the deadline is skipped (partial reps still carry
# spreads; 2 interleaved reps beat 3 that poison the headline bench).
DEADLINE="${MERGE_AB_DEADLINE:-$(cat .merge_ab_deadline 2>/dev/null || echo $(( $(date +%s) + 86400 )) )}"

for rep in 1 2 3; do
  for arm in verified exact; do
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "=== [$(date +%H:%M:%S)] merge_ab DEADLINE hit; stopping at rep=$rep arm=$arm" \
        | tee -a logs_r5/queue.log
      exit 0
    fi
    echo "=== [$(date +%H:%M:%S)] merge_ab rep=$rep arm=$arm 10M" \
      | tee -a logs_r5/queue.log
    # --stream: each rep also measures sustained-stream qps at 10M
    # (VERDICT #7), so the stream number lands with a spread too
    AUNCEL_LADDER_MERGE=$arm timeout 7200 \
      python -m auncel_tpu.eval_harness.bound synthDeep10M 3000 1000 10 \
      0.10 --storage sq8 --profile-size 1000 --batch-latency 0 --stream \
      > "logs_r5/ab10M_${arm}_${rep}.out" \
      2> "logs_r5/ab10M_${arm}_${rep}.err"
    echo "=== [$(date +%H:%M:%S)] merge_ab rep=$rep arm=$arm bench1M" \
      | tee -a logs_r5/queue.log
    AUNCEL_LADDER_MERGE=$arm timeout 3600 python bench.py \
      > "logs_r5/ab1M_${arm}_${rep}.out" \
      2> "logs_r5/ab1M_${arm}_${rep}.err"
  done
done
echo "=== [$(date +%H:%M:%S)] merge_ab DONE" | tee -a logs_r5/queue.log
