#!/usr/bin/env bash
# Round-4 TPU-recovery runbook (VERDICT.md "Next round" tasks 1-2), in
# priority order, resumable. Run AFTER scripts/tpu_wait.sh reports the
# tunnel alive. Each step logs under runs/r4_tpu/.
#
#   1. recapture the driver bench       -> runs/r4_tpu/bench.json
#   2. lowsim_15x15 throughput row      -> runs/r4_tpu/lowsim.json
#   3. launch the 19x19 Renju training  -> runs/pretrained_19x19 (detached,
#      warm-started from the surgery transfer init, under the stall
#      watchdog; logs every 25 iters are losslessly resumable)
#
# Steps 1-2 are minutes; step 3 runs for the rest of the round.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r4_tpu

echo "[recovery] bench.py $(date -u +%FT%TZ)"
timeout 3600 python bench.py | tee runs/r4_tpu/bench.json

echo "[recovery] lowsim_15x15 selfplay bench $(date -u +%FT%TZ)"
timeout 3600 python -m alphafive_tpu.benchmarks.selfplay_bench \
    --preset lowsim_15x15 | tee runs/r4_tpu/lowsim.json || true

echo "[recovery] launching 19x19 warm-start training $(date -u +%FT%TZ)"
STALL_MINUTES=30 nohup scripts/train_retry.sh train_19x19 \
    runs/pretrained_19x19 --init-from runs/transfer19_init \
    > runs/r4_tpu/train_launcher.log 2>&1 &
echo "[recovery] trainer launcher pid $!"
