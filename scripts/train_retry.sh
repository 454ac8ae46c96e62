#!/usr/bin/env bash
# Auto-resume training wrapper for the flaky remote-TPU tunnel.
#
# The axon worker watchdog kills device executions that run too long and the
# tunnel itself flakes roughly hourly (docs/PERFORMANCE.md, SURVEY.md §5.3);
# checkpoints every 25 iterations make a crash lossless, so the right
# recovery is simply "resume until the trainer exits cleanly".
#
# Failure modes handled:
#   * crash/exit (tunnel flake kills the client)  -> resume after 15s
#   * fast deterministic failure (bad flag, import error) -> give up after 3
#   * HANG (round 3: a tunnel outage can leave the client blocked forever in
#     a device call instead of erroring; the run then stalls silently) ->
#     a stall watchdog kills the trainer when train.log stops growing for
#     STALL_MINUTES (default 30 — generous enough for the first big XLA
#     compile and the largest host-stepped anchor eval, both ~10 min).
#
# Usage: [STALL_MINUTES=30] scripts/train_retry.sh <preset> <workdir> [extra cli args...]
set -u
PRESET=$1; WORKDIR=$2; shift 2
STALL_MINUTES=${STALL_MINUTES:-30}
cd "$(dirname "$0")/.."
mkdir -p "$WORKDIR"
ATTEMPT=0
FAST_FAILS=0
while true; do
  ATTEMPT=$((ATTEMPT + 1))
  echo "[train_retry] attempt $ATTEMPT $(date -u +%FT%TZ)" >> "$WORKDIR/retry.log"
  START=$(date +%s)
  python -m alphafive_tpu.cli train --preset "$PRESET" --workdir "$WORKDIR" \
    --resume "$@" >> "$WORKDIR/train.log" 2>&1 &
  TRAINER=$!
  # stall watchdog: kill the exact trainer PID (never a pattern) if the log
  # goes quiet for STALL_MINUTES while the process is still alive
  (
    while kill -0 "$TRAINER" 2>/dev/null; do
      sleep 60
      if [ -f "$WORKDIR/train.log" ]; then
        AGE=$(( $(date +%s) - $(stat -c %Y "$WORKDIR/train.log") ))
        if [ "$AGE" -ge $(( STALL_MINUTES * 60 )) ]; then
          echo "[train_retry] stall: no log output for ${AGE}s — killing trainer pid $TRAINER $(date -u +%FT%TZ)" >> "$WORKDIR/retry.log"
          kill "$TRAINER" 2>/dev/null
          sleep 10
          kill -9 "$TRAINER" 2>/dev/null
          break
        fi
      fi
    done
  ) &
  WATCHDOG=$!
  wait "$TRAINER"
  CODE=$?
  kill "$WATCHDOG" 2>/dev/null
  ELAPSED=$(( $(date +%s) - START ))
  echo "[train_retry] exit $CODE after ${ELAPSED}s $(date -u +%FT%TZ)" >> "$WORKDIR/retry.log"
  if [ $CODE -eq 0 ]; then
    break
  fi
  # deterministic failures (bad preset, import error) die immediately and
  # would otherwise spin forever; only tunnel flakes deserve retries
  if [ $ELAPSED -lt 60 ]; then
    FAST_FAILS=$((FAST_FAILS + 1))
    if [ $FAST_FAILS -ge 3 ]; then
      echo "[train_retry] giving up: $FAST_FAILS consecutive failures in <60s (not a tunnel flake)" >> "$WORKDIR/retry.log"
      exit $CODE
    fi
  else
    FAST_FAILS=0
  fi
  sleep 15
done
