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
while true; do
  python main.py "$@"
  code=$?
  if [ "$code" -ne 75 ]; then
    exit "$code"
  fi
  echo "[train_until_done] RSS limit hit (exit 75); resuming in a fresh process"
done
