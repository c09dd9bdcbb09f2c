#!/usr/bin/env bash
# Restart-on-RSS-limit training wrapper.
#
# Some remote-device transports leak host memory per executed step (see
# rss_limit_gb in efgh_tpu/config.py); with rss_limit_gb set, the train
# loop checkpoints and exits 75 when the limit is crossed.  This wrapper
# resumes in a fresh process until training actually finishes (exit 0)
# or fails (any other code).
#
# Usage: scripts/train_until_done.sh configs/train_foo.yaml [extra args...]
set -u
# persistent XLA compile cache: each watchdog restart re-runs the identical
# jit code paths, so the ~5 min train-step recompile becomes a ~10 s cache
# hit (measured: benchmarks/pyramid_compile_repro.py, 295 s -> 11.6 s)
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$(dirname "$0")/../.cache/xla}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="${JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS:-10}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
while true; do
  python main.py "$@"
  code=$?
  if [ "$code" -ne 75 ]; then
    exit "$code"
  fi
  echo "[train_until_done] RSS limit hit (exit 75); resuming in a fresh process"
done
