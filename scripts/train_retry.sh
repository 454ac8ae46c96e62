#!/usr/bin/env bash
# Auto-resume training wrapper for the flaky remote-TPU tunnel.
#
# The axon worker watchdog kills device executions that run too long and the
# tunnel itself flakes roughly hourly (docs/PERFORMANCE.md, SURVEY.md §5.3);
# checkpoints every 25 iterations make a crash lossless, so the right
# recovery is simply "resume until the trainer exits cleanly".
#
# Usage: scripts/train_retry.sh <preset> <workdir> [extra cli args...]
set -u
PRESET=$1; WORKDIR=$2; shift 2
cd "$(dirname "$0")/.."
mkdir -p "$WORKDIR"
ATTEMPT=0
FAST_FAILS=0
while true; do
  ATTEMPT=$((ATTEMPT + 1))
  echo "[train_retry] attempt $ATTEMPT $(date -u +%FT%TZ)" >> "$WORKDIR/retry.log"
  START=$(date +%s)
  python -m alphafive_tpu.cli train --preset "$PRESET" --workdir "$WORKDIR" \
    --resume "$@" >> "$WORKDIR/train.log" 2>&1
  CODE=$?
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
