#!/bin/bash
# Stall watchdog for long remote-TPU jobs.
#
# The remote-TPU relay occasionally wedges mid-request (a blocked client
# call never returns and blocks the whole relay; observed twice in round 3,
# see PERF.md harness notes). Long-running jobs whose scripts support
# resume (scripts/accuracy_study.py, scripts/dtype_equivalence.py) can be
# made wedge-proof by restarting them when their log stops moving.
#
# Usage: scripts/tpu_watchdog.sh LOGFILE STALL_SECS MAX_RESTARTS CMD...
# Runs CMD >> LOGFILE in its own session (setsid), so a stall kill targets
# exactly CMD's process tree by process-group id — never by name pattern.
# If LOGFILE's mtime goes stale for STALL_SECS while CMD runs, the tree is
# killed and CMD restarted, up to MAX_RESTARTS times. Exits with CMD's
# status once it finishes on its own. A run that fails within FAST_FAIL_SECS
# (default 120, env-overridable) without having stalled is treated as a
# deterministic failure (e.g. the study scripts' stale-artifact guards) and
# its exit status is propagated immediately instead of retried.
set -u
LOG=$1; STALL=$2; MAXR=$3; shift 3
FAST_FAIL_SECS=${FAST_FAIL_SECS:-120}

restarts=0
while :; do
  t_start=$(date +%s)
  # PYTHONUNBUFFERED: with stdout redirected to a file, python block-buffers
  # (~8KB) — at ~100 bytes per epoch line a healthy run's log mtime could
  # otherwise go stale for hours and trip the stall detector.
  setsid env PYTHONUNBUFFERED=1 "$@" >> "$LOG" 2>&1 &
  pid=$!
  echo "[watchdog] started pid=$pid (restart #$restarts)" >> "$LOG"
  stalled=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    # Re-check liveness AFTER the sleep: a job that exits right after its
    # last log write must not be misread as stalled.
    kill -0 "$pid" 2>/dev/null || break
    age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || echo 0) ))
    if [ "$age" -ge "$STALL" ]; then
      echo "[watchdog] log stale ${age}s >= ${STALL}s — killing group $pid" >> "$LOG"
      kill -- -"$pid" 2>/dev/null; sleep 5; kill -9 -- -"$pid" 2>/dev/null
      stalled=1
      break
    fi
  done
  wait "$pid" 2>/dev/null
  rc=$?
  if [ "$stalled" -eq 0 ] && [ "$rc" -eq 0 ]; then
    echo "[watchdog] finished ok" >> "$LOG"
    exit 0
  fi
  elapsed=$(( $(date +%s) - t_start ))
  if [ "$stalled" -eq 0 ] && [ "$elapsed" -lt "$FAST_FAIL_SECS" ]; then
    echo "[watchdog] failed in ${elapsed}s (rc=$rc) — deterministic failure, not retrying" >> "$LOG"
    exit "$rc"
  fi
  restarts=$((restarts + 1))
  if [ "$restarts" -gt "$MAXR" ]; then
    echo "[watchdog] giving up after $MAXR restarts (last rc=$rc)" >> "$LOG"
    exit "$rc"
  fi
  echo "[watchdog] restarting after rc=$rc" >> "$LOG"
  sleep 120
done
