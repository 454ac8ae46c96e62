#!/usr/bin/env bash
# Round-4 transfer-probe upgrade (VERDICT.md task 8): >=32 games per row,
# probes at the training preset's own budget (240 sims — round 3 probed at
# 64), plus the previously-missing 10-block init row and a fresh-net
# control. Appends one line per row to runs/transfer_probes_r4.log.
#
# Usage: scripts/transfer_probes_r4.sh [platform]   (default cpu)
set -u
PLATFORM=${1:-cpu}
cd "$(dirname "$0")/.."
LOG=runs/transfer_probes_r4.log
run_row () {  # name workdir preset anchor games sims
  echo "== $1 anchor=$4 games=$5 sims=$6 $(date -u +%FT%TZ)" >> "$LOG"
  timeout 21600 python -m alphafive_tpu.cli eval --preset "$3" \
    --workdir "$2" --games "$5" --anchor-rollouts "$4" \
    --platform "$PLATFORM" --set train.eval_simulations="$6" \
    2>&1 | grep -vE "WARNING|cpu_aot" | tail -2 >> "$LOG"
}
# rows in evidence-value order (the 6-block init is the one the 19x19
# warm start uses)
run_row 6b-vs-200  runs/transfer19_init     train_19x19 200 32 240
run_row 6b-vs-800  runs/transfer19_init     train_19x19 800 32 240
run_row 10b-vs-200 runs/transfer19_10b_init renju_19x19 200 32 240
echo "done $(date -u +%FT%TZ)" >> "$LOG"
