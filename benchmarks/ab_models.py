"""Net-vs-net strength match between two exported models.

The reference family's eval gate plays the CURRENT net against the BEST
net (SURVEY.md §3.5 "new net vs old net ... win-rate gate"); our
training loop gates on the pure-MCTS anchor ladder instead (preset-
independent Elo scale), so this harness supplies the missing direct
form: two exports, identical neutral search both sides (classic exact
PUCT, no noise, greedy after the opening), shared random openings,
both color assignments.

Usage:

    python benchmarks/ab_models.py --a pretrained/19x19 \
        --b runs/export_iter225 --games 64 --sims 240

Prints one JSON line: score of A, W/D/L, performance Elo of A vs B.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="exported model dir (side A)")
    ap.add_argument("--b", required=True, help="exported model dir (side B)")
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--sims", type=int, default=240)
    ap.add_argument("--sims-b", type=int, default=None,
                    help="budget for B (default: same as A)")
    ap.add_argument("--opening-plies", type=int, default=6)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from alphafive_tpu.config import MCTSConfig
    from alphafive_tpu.models.evaluator import net_evaluator
    from alphafive_tpu.train import checkpoint as ckpt
    from alphafive_tpu.train.evaluate import evaluate_vs
    from alphafive_tpu.utils.elo import performance_elo

    pa, bsa, cfg_a = ckpt.load_model(args.a)
    pb, bsb, cfg_b = ckpt.load_model(args.b)
    assert cfg_a.env.board_size == cfg_b.env.board_size, \
        (cfg_a.env.board_size, cfg_b.env.board_size)
    assert cfg_a.env.rules == cfg_b.env.rules, (cfg_a.env.rules,
                                                cfg_b.env.rules)
    env_cfg = cfg_a.env
    ev_a = net_evaluator(env_cfg, cfg_a.net, pa, bsa)
    ev_b = net_evaluator(env_cfg, cfg_b.net, pb, bsb)

    neutral = MCTSConfig(num_simulations=args.sims)
    sims_b = args.sims_b or args.sims
    t0 = time.time()
    res = evaluate_vs(env_cfg, neutral, ev_a, ev_b, args.sims, sims_b,
                      args.games, jax.random.key(args.seed),
                      opening_plies=args.opening_plies)
    print(json.dumps({
        "a": args.a, "b": args.b,
        "board": env_cfg.board_size, "rules": env_cfg.rules,
        "sims_a": args.sims, "sims_b": sims_b,
        **res,
        "elo_a_vs_b": performance_elo(res["score"], 0.0,
                                      games=res.get("games")),
        "match_seconds": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
