"""Headline benchmark: self-play env-steps/s/chip at 15×15 (BASELINE.json:2).

Runs the chip_15x15 config (256 lockstep envs, 400-sim batched MCTS,
4-block 64-ch net — BASELINE.json:8) on the available accelerator and
prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.json:13 "published": {});
`vs_baseline` is computed against the reference-implied magnitude of
10 env-steps/s/process for recursive Python MCTS with batch-1 leaf
evaluations (SURVEY.md §6 — a deliberately generous upper bound for it).
"""

from __future__ import annotations

import json
import sys

# Reference-implied self-play throughput (SURVEY.md §6): O(10^0-10^1)
# env-steps/s per process. Use the upper end to stay conservative.
BASELINE_ENV_STEPS_PER_S = 10.0


def main() -> int:
    from alphafive_tpu.config import get_preset
    from alphafive_tpu.benchmarks import selfplay_bench

    cfg = get_preset("chip_15x15")
    result = selfplay_bench.run(cfg, plies=8, warmup=1, repeats=3)

    value = result["env_steps_per_s_per_chip"]
    out = {
        "metric": "selfplay_env_steps_per_s_per_chip_15x15_256env_400sim",
        "value": round(value, 2),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(value / BASELINE_ENV_STEPS_PER_S, 2),
        "detail": result,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
