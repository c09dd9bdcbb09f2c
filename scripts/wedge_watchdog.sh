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
#
# STOP_AT (optional, epoch seconds): at that time the watchdog harvests the
# trainer via the STOP file and exits — the mechanical enforcement of the
# device-window rule "leave NO trainer running at round end; the driver's
# bench needs the single-tenant tunnel" (round-4 verdict: a live s6a
# trainer corrupted the driver bench into stale-transport garbage).
set -u
CFG="$1"
LOG="$2"
STOP_AT="${STOP_AT:-}"
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

CKPT_DIR=$(awk -F': *' '$1=="ckpt_dir"{gsub(/["'"'"']/,"",$2); print $2; exit}' "$CFG")

LAST_T=""
LAST_PID=""
FROZEN=0
while true; do
  sleep "$POLL"
  if ! kill -0 "$WRAPPER" 2>/dev/null; then
    echo "[watchdog] wrapper exited — trainer finished or failed; stopping"
    exit 0
  fi
  if [ -n "$STOP_AT" ] && [ "$(date +%s)" -ge "$STOP_AT" ]; then
    echo "[watchdog] $(date -u +%H:%M:%S) STOP_AT reached — harvesting via STOP file"
    touch "${CKPT_DIR:-.}/STOP"
    # STOP is consumed at the next log_every boundary (seconds); give the
    # final checkpoint write a generous bound, then hard-stop stragglers
    W=0
    while kill -0 "$WRAPPER" 2>/dev/null && [ "$W" -lt 900 ]; do sleep 10; W=$((W+10)); done
    if kill -0 "$WRAPPER" 2>/dev/null; then
      PID=$(trainer_pid)
      echo "[watchdog] trainer ignored STOP for ${W}s — killing ${PID:-} + wrapper $WRAPPER"
      [ -n "${PID:-}" ] && kill -9 "$PID" 2>/dev/null
      kill -9 "$WRAPPER" 2>/dev/null
    else
      echo "[watchdog] trainer harvested cleanly at STOP_AT"
    fi
    exit 0
  fi
  PID=$(trainer_pid)
  if [ -z "${PID:-}" ]; then continue; fi   # between restarts
  if [ "$PID" != "${LAST_PID:-}" ]; then
    # a new trainer process (wrapper restart): its cputime string can
    # coincide with the old one's, so never carry FROZEN across PIDs
    LAST_T=""; FROZEN=0
  fi
  LAST_PID="$PID"
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
    # wrapper exits on non-75; poll it down BOUNDED (it may be an adopted
    # process, not our child, so `wait` can't be used).  If the trainer's
    # RSS watchdog raced to exit 75 first, the wrapper restarts instead of
    # exiting — resume monitoring the new trainer rather than spinning
    W=0
    while kill -0 "$WRAPPER" 2>/dev/null && [ "$W" -lt 60 ]; do sleep 5; W=$((W+5)); done
    if kill -0 "$WRAPPER" 2>/dev/null; then
      echo "[watchdog] wrapper survived the kill (RSS-exit race) — resuming monitoring"
      LAST_T=""; LAST_PID=""; FROZEN=0
      continue
    fi
    until probe_device; do
      echo "[watchdog] device not back yet; re-probing in 120 s"
      sleep 120
    done
    echo "[watchdog] device recovered — relaunching"
    launch
    LAST_T=""; LAST_PID=""; FROZEN=0
  fi
done
