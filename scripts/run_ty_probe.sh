#!/usr/bin/env bash
# One-sample-per-process driver for benchmarks/ty_matching_probe.py.
#
# At the probe's executable size the tunnel mis-executes REPEATED runs of
# the same loaded executable (readbacks go INVALID_ARGUMENT and stay
# poisoned in-process — measured 2026-08-21, probe docstring).  A fresh
# process per sample resets the transport; the persistent XLA compile
# cache keeps re-entry cheap.  Failed chunks are skipped (the summary is
# over whatever landed in ty_probe_samples.jsonl).
#
# Usage: scripts/run_ty_probe.sh [n_samples] [config] [ckpt]
set -u
cd "$(dirname "$0")/.."
N="${1:-16}"
CFG="${2:-configs/test_synthetic_s6a_running.yaml}"
CKPT="${3:-}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-.cache/xla}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
rm -f benchmarks/ty_probe_samples.jsonl
for i in $(seq 0 $((N - 1))); do
  echo "== probe sample $i =="
  EFGH_PROBE_START="$i" EFGH_PROBE_SAMPLES=1 \
    timeout 1800 python benchmarks/ty_matching_probe.py $CFG $CKPT \
    || echo "[run_ty_probe] sample $i failed; continuing"
done
python benchmarks/ty_matching_probe.py --summarize
