#!/usr/bin/env bash
# Experiment matrix driver (reference Auncel/eval/run.sh + effect.sh:
# datasets x k x error-bound sweeps). Defaults to the self-contained
# synthetic dataset; set AUNCEL_DATA_ROOT and pass real dataset names
# (sift1M sift10M deep10M gist text) for file-based runs.
set -euo pipefail
cd "$(dirname "$0")/.."

DB="${1:-synth100K}"
TS="${2:-1000}"
SES="${3:-1000}"

# overall latency/bound experiments: k x epsilon grid (run.sh:3-17)
for K in 10 50 100; do
  for EPS in 0.10 0.05 0.01; do
    echo "=== bound: db=$DB k=$K eps=$EPS ==="
    python -m auncel_tpu.eval_harness.bound "$DB" "$TS" "$SES" "$K" "$EPS"
  done
done

# effectiveness experiments (effect.sh)
echo "=== effect_error ==="
python -m auncel_tpu.eval_harness.effect_error "$DB" "$TS" "$SES" 10
echo "=== effect_time ==="
python -m auncel_tpu.eval_harness.effect_time "$DB" "$TS" "$SES" 10

# ELP instrumentation overhead (overhead.sh)
echo "=== overhead ==="
python -m auncel_tpu.eval_harness.overhead "$DB" "$TS" "$SES" 10 0.10

# distributed scaling (dist/sh -> figure 16)
echo "=== dist scaling ==="
python -m auncel_tpu.eval_harness.dist_bench "$DB" --shards 1 2 4 8
