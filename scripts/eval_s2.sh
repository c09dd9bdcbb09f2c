#!/usr/bin/env bash
# Post-training evaluation pipeline for the segment-2 synthetic lineage.
#
# Runs after train_until_done.sh train_synthetic_b2_s2.yaml exits 0:
#   1. snapshot the final checkpoint to a git-committable .npz
#   2. held-out frozen-split eval under eval_bn: batch (trained semantics)
#   3. same eval under eval_bn: running (reference main.py:132-147 protocol)
#   4. per-axis translation regression on the batch-mode predictions
#
# Usage: scripts/eval_s2.sh [ckpt_dir] (default ckpts/synth_s2)
set -eu
cd "$(dirname "$0")/.."
CKPT="${1:-ckpts/synth_s2}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-.cache/xla}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10

echo "== [1/4] export weights =="
python scripts/export_weights.py "$CKPT/checkpoint" params/efgh_synth_s2.npz

echo "== [2/4] eval (eval_bn: batch) =="
python main.py configs/test_synthetic_s2.yaml

echo "== [3/4] eval (eval_bn: running, reference protocol) =="
python main.py configs/test_synthetic_s2_running.yaml

echo "== [4/4] per-axis analysis =="
# ckpt_path lives in params/, so test() writes under test/preds/params/
python scripts/analyze_preds.py \
  test/preds/params/synthetic_frozen_test_s2.csv \
  configs/test_synthetic_s2.yaml
