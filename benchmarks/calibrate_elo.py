"""Measure the Elo gap per rollout-doubling of the pure-MCTS anchor ladder.

utils/elo.py historically assumed +120 Elo per doubling ("conventional" for
this game family); round-1 VERDICT item 6 asks for data. This plays a
round-robin between pure-MCTS anchors at doubling budgets (both colors,
stochastic rollout evaluators — no opening randomization needed), converts
each pairwise score to an Elo gap, and checks adjacent gaps against skip
pairs for additivity.

    python benchmarks/calibrate_elo.py --board 9 --games 64 \
        --budgets 200 400 800 1600 3200

Prints one JSON line; docs/PERFORMANCE.md records the measured table.
"""

from __future__ import annotations

import argparse
import itertools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gap_elo(score: float) -> float:
    s = min(max(score, 1e-3), 1 - 1e-3)
    return -400.0 * math.log10(1.0 / s - 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--board", type=int, default=9)
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--budgets", type=int, nargs="+",
                    default=[200, 400, 800, 1600, 3200])
    ap.add_argument("--skip-pairs", type=int, default=2,
                    help="also measure pairs this many levels apart")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from alphafive_tpu.config import EnvConfig, MCTSConfig
    from alphafive_tpu.models.evaluator import rollout_evaluator
    from alphafive_tpu.train.evaluate import evaluate_vs

    env_cfg = EnvConfig(board_size=args.board)
    mcts_cfg = MCTSConfig()  # canonical exact anchor search
    ev = rollout_evaluator(env_cfg)

    pairs = [(i, i + 1) for i in range(len(args.budgets) - 1)]
    if args.skip_pairs:
        pairs += [(i, i + args.skip_pairs)
                  for i in range(len(args.budgets) - args.skip_pairs)]

    key = jax.random.key(args.seed)
    rows = []
    for i, j in pairs:
        lo, hi = args.budgets[i], args.budgets[j]
        key, k = jax.random.split(key)
        t0 = time.time()
        res = evaluate_vs(env_cfg, mcts_cfg, ev, ev, hi, lo,
                          args.games, k)   # A = the BIGGER budget
        per_doubling = gap_elo(res["score"]) / (j - i)
        rows.append({
            "hi": hi, "lo": lo, "levels": j - i,
            "score_hi": res["score"], **{k_: res[k_] for k_ in
                                         ("wins", "losses", "draws")},
            "gap_elo": round(gap_elo(res["score"]), 1),
            "elo_per_doubling": round(per_doubling, 1),
            "seconds": round(time.time() - t0, 1),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    adj = [r["elo_per_doubling"] for r in rows if r["levels"] == 1]
    mean_step = sum(adj) / max(len(adj), 1)
    print(json.dumps({
        "experiment": "elo_ladder_calibration",
        "board": args.board, "games_per_pair": args.games,
        "budgets": args.budgets,
        "pairs": rows,
        "mean_elo_per_doubling_adjacent": round(mean_step, 1),
    }))


if __name__ == "__main__":
    main()
