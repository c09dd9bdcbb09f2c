#!/usr/bin/env bash
# Tunnel-wedge watchdog for a live trainer.
#
# The remote-device transport occasionally wedges the client: every thread
# parks in futex_wait, the log stops, and CPU time freezes (observed 4x in
# round 4; docs/DEVICE_WINDOW_R4.md).  The RSS watchdog inside the trainer
# can't fire — the process isn't running.  This script watches the python
# child of a train_until_done.sh wrapper and, when its cumulative CPU time
# stops advancing for FREEZE_SECS, SIGKILLs it BY PID (never by pattern),
# probes the device until the remote side drops the dead session, and
# relaunches the wrapper.  Progress is lossless up to the last rotation
# checkpoint / STOP harvest.
#
# Usage: scripts/wedge_watchdog.sh configs/train_foo.yaml logs/foo.log
set -u
CFG="$1"
LOG="$2"
# 15 min: long enough that a cold device-side compile (client CPU idle
# ~5-8 min with a warm sample cache) can never false-trigger; a real wedge
# costs 15 min + recovery instead of the rest of the session
FREEZE_SECS="${FREEZE_SECS:-900}"
POLL="${POLL:-60}"
cd "$(dirname "$0")/.."

cputime() {  # cumulative utime+stime ticks of $1, or empty if gone
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null
}

launch() {
  nohup bash scripts/train_until_done.sh "$CFG" >> "$LOG" 2>&1 &
  WRAPPER=$!
  echo "$WRAPPER" > /tmp/train_wrapper.pid
  echo "[watchdog] launched wrapper $WRAPPER"
}

trainer_pid() {  # the python descendant of the wrapper (PID-walk, no
  # patterns; launch layering varies, so walk up to 4 levels deep)
  local frontier="$WRAPPER" next k
  for _ in 1 2 3 4; do
    next=""
    for k in $frontier; do
      if grep -q "^python" "/proc/$k/comm" 2>/dev/null; then
        echo "$k"; return
      fi
      next="$next $(ps -o pid= --ppid "$k" 2>/dev/null)"
    done
    frontier="${next# }"
    [ -z "${frontier// /}" ] && return
  done
}

probe_device() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

if [ -s /tmp/train_wrapper.pid ] && kill -0 "$(cat /tmp/train_wrapper.pid)" 2>/dev/null; then
  WRAPPER=$(cat /tmp/train_wrapper.pid)
  echo "[watchdog] adopting running wrapper $WRAPPER"
else
  launch
fi

LAST_T=""
FROZEN=0
while true; do
  sleep "$POLL"
  if ! kill -0 "$WRAPPER" 2>/dev/null; then
    echo "[watchdog] wrapper exited — trainer finished or failed; stopping"
    exit 0
  fi
  PID=$(trainer_pid)
  if [ -z "${PID:-}" ]; then continue; fi   # between restarts
  T=$(cputime "$PID")
  if [ -n "$T" ] && [ "$T" = "${LAST_T:-}" ]; then
    FROZEN=$((FROZEN + POLL))
  else
    FROZEN=0
  fi
  LAST_T="$T"
  if [ "$FROZEN" -ge "$FREEZE_SECS" ]; then
    echo "[watchdog] $(date -u +%H:%M:%S) trainer $PID frozen ${FROZEN}s — killing"
    echo "[watchdog] wedge: killing frozen trainer $PID" >> "$LOG"
    kill -9 "$PID" 2>/dev/null
    # wrapper exits on non-75; poll it down (it may be an adopted process,
    # not our child, so `wait` can't be used), then wait out the remote
    # session before relaunching
    while kill -0 "$WRAPPER" 2>/dev/null; do sleep 5; done
    until probe_device; do
      echo "[watchdog] device not back yet; re-probing in 120 s"
      sleep 120
    done
    echo "[watchdog] device recovered — relaunching"
    launch
    LAST_T=""; FROZEN=0
  fi
done
