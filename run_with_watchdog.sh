#!/bin/bash
# Watchdog runner for TPU jobs over the flaky tunnel transport: if the job's
# log stops growing for STALL_SECS, kill it, wait for the device to answer a
# probe again, and relaunch (up to MAX_RETRIES).
#
# Usage: bash run_with_watchdog.sh LOGFILE STALL_SECS MAX_RETRIES CMD...
set -u
LOG="$1"; STALL="$2"; RETRIES="$3"; shift 3

probe_tpu() {
  timeout 90 python -c "import jax, jax.numpy as jnp; jnp.ones((2,2)).sum().block_until_ready()" >/dev/null 2>&1
}

wait_tpu() {
  for _ in $(seq 1 40); do
    probe_tpu && return 0
    sleep 20
  done
  return 1
}

for attempt in $(seq 1 "$RETRIES"); do
  echo "[watchdog] attempt $attempt: $*" >> "$LOG.watchdog"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  LAST_SIZE=0
  LAST_CHANGE=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    SIZE=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    NOW=$(date +%s)
    if [ "$SIZE" != "$LAST_SIZE" ]; then
      LAST_SIZE=$SIZE
      LAST_CHANGE=$NOW
    elif [ $((NOW - LAST_CHANGE)) -gt "$STALL" ]; then
      echo "[watchdog] stalled ${STALL}s; killing $PID" >> "$LOG.watchdog"
      kill -9 "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      break
    fi
  done
  if ! kill -0 "$PID" 2>/dev/null; then
    wait "$PID" 2>/dev/null
    RC=$?
    if [ "$RC" -eq 0 ]; then
      echo "[watchdog] success on attempt $attempt" >> "$LOG.watchdog"
      exit 0
    fi
  fi
  echo "[watchdog] waiting for TPU to answer probes..." >> "$LOG.watchdog"
  wait_tpu || { echo "[watchdog] TPU never recovered" >> "$LOG.watchdog"; exit 2; }
  sleep 10
done
echo "[watchdog] exhausted retries" >> "$LOG.watchdog"
exit 1
