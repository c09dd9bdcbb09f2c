#!/usr/bin/env bash
# Post-training evaluation pipeline for the segment-7 synthetic lineage
# (train_synthetic_b2_s7.yaml: projective matching readout (g_matching) +
# uvprod channels, lossless from the s6a full-state snapshot).
#
# Runs after train_until_done.sh configs/train_synthetic_b2_s7.yaml exits 0:
#   1. snapshot the best checkpoint to a git-committable .npz
#   2. held-out frozen-split eval under eval_bn: batch (trained semantics)
#   3. same eval under eval_bn: running (reference main.py:132-147 protocol)
#   4. per-axis translation regression on both prediction CSVs
#
# Usage: scripts/eval_s7.sh [ckpt] (default ckpts/synth_s7c/model_best)
set -eu
cd "$(dirname "$0")/.."
CKPT="${1:-ckpts/synth_s7c/model_best}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-.cache/xla}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
export EFGH_BENCH_CACHE_DIR="${EFGH_BENCH_CACHE_DIR:-.cache/synth}"

echo "== [1/4] export weights =="
python scripts/export_weights.py "$CKPT" params/efgh_synth_s7.npz
# full-state snapshot of the LATEST checkpoint (not model_best): Adam
# moments + step, so the next round resumes the segment losslessly after
# the host rebuild (configs/train_synthetic_b2_s7_resume.yaml)
if [ -d ckpts/synth_s7c/checkpoint ]; then
  python scripts/export_weights.py ckpts/synth_s7c/checkpoint \
    params/efgh_synth_s7_full.npz --with-opt
fi

echo "== [2/4] eval (eval_bn: batch) =="
python main.py configs/test_synthetic_s7.yaml

echo "== [3/4] eval (eval_bn: running, reference protocol) =="
python main.py configs/test_synthetic_s7_running.yaml

echo "== [4/4] per-axis analysis =="
# ckpt_path lives in params/, so test() writes under test/preds/params/
python scripts/analyze_preds.py \
  test/preds/params/synthetic_frozen_test_s7_running.csv \
  configs/test_synthetic_s7_running.yaml
python scripts/analyze_preds.py \
  test/preds/params/synthetic_frozen_test_s7.csv \
  configs/test_synthetic_s7.yaml
