#!/bin/bash
# Soak-run watchdog: relaunch-with---resume whenever training stops
# making progress (the tunneled TPU client recurrently wedges one
# connection mid-transfer — multi-MB stuck in the socket Send-Q, zero
# steps, ~25 min stalls observed; see experiments/README.md soak
# section).  Exact mid-epoch resume + the persistent compile cache make
# kill+resume loss-free, so the watchdog turns an infra flake into a
# bounded hiccup.  Ops-layer tool: the framework itself stays clean.
#
# Usage: soak_watchdog.sh <workdir> <logprefix> -- <train cmd...>
#   The train cmd must include --resume (idempotent on a fresh dir
#   only when a checkpoint exists — pass it; first launch without one
#   should be done by hand before starting the watchdog).
# Tunables via env: GRACE_S (default 1200) after each (re)launch,
# STALL_S (default 600) without metrics.jsonl growth -> kill+resume.

set -u
WORKDIR=$1; LOGPREFIX=$2; shift 2
[ "$1" = "--" ] && shift
GRACE_S=${GRACE_S:-1200}
STALL_S=${STALL_S:-600}
METRICS="$WORKDIR/metrics.jsonl"
GEN=0

while true; do
  GEN=$((GEN + 1))
  LOG="${LOGPREFIX}_gen${GEN}.log"
  "$@" > "$LOG" 2>&1 &
  PID=$!
  echo "watchdog: gen $GEN pid $PID -> $LOG"
  LAUNCH=$(date +%s)
  LAST_SIZE=$(stat -c %s "$METRICS" 2>/dev/null || echo 0)
  LAST_GROW=$LAUNCH
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    NOW=$(date +%s)
    SIZE=$(stat -c %s "$METRICS" 2>/dev/null || echo 0)
    if [ "$SIZE" != "$LAST_SIZE" ]; then
      LAST_SIZE=$SIZE; LAST_GROW=$NOW
    fi
    AGE=$((NOW - LAST_GROW)); UP=$((NOW - LAUNCH))
    if [ "$UP" -gt "$GRACE_S" ] && [ "$AGE" -gt "$STALL_S" ]; then
      echo "watchdog: gen $GEN stalled ${AGE}s (no metrics growth) — killing $PID"
      kill -9 "$PID" 2>/dev/null
      sleep 5
      break
    fi
  done
  wait "$PID" 2>/dev/null
  RC=$?
  if [ "$RC" -eq 0 ]; then
    echo "watchdog: gen $GEN finished rc=0 — done"
    exit 0
  fi
  echo "watchdog: gen $GEN exited rc=$RC — resuming (gen $((GEN + 1)))"
done
