"""Training-soundness A/B: gumbel improved-policy targets vs classic
visit-count targets, end to end.

The match-play studies (ab_strength.py, PERFORMANCE.md "Gumbel root
search") show the gumbel ROOT picks stronger moves at low budgets; this
harness tests the other half of the scheme — that TRAINING on
π' = softmax(logits + σ(completed Q)) produces a net at least as strong
as the classic Dirichlet + visit-count pipeline at the same simulation
budget. Two identical runs (same preset, seed, iteration count, net)
differ ONLY in mcts.root_selection; the resulting nets then cross-play
under the SAME neutral search config (classic PUCT, no noise, greedy)
so only net quality is measured, plus each plays the pure-MCTS anchor.

Usage (CPU, ~15 min at the defaults):

    python benchmarks/ab_train_gumbel.py --iters 300 --games 64
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny_test",
                    help="base RunConfig preset for BOTH training runs")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="SEC.FIELD=VAL",
                    help="config overrides applied to BOTH runs "
                         "(cli --set grammar)")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--sims", type=int, default=16,
                    help="self-play budget for BOTH training runs")
    ap.add_argument("--eval-sims", type=int, default=64,
                    help="neutral match search budget")
    ap.add_argument("--anchor-rollouts", type=int, default=256)
    ap.add_argument("--eval-every", type=int, default=0,
                    help="in-run anchor-ladder evals every N iters (0 = "
                         "off, the fast default); >0 gives each arm a "
                         "ladder CURVE in its workdir, not just the final "
                         "point — use with --workdir-root")
    ap.add_argument("--opening-plies", type=int, default=2)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir-root", default=None,
                    help="keep the two runs (checkpoints + metrics.jsonl) "
                         "under <root>/{gumbel,puct} instead of tempdirs")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from alphafive_tpu.cli import _apply_overrides
    from alphafive_tpu.config import MCTSConfig, get_preset
    from alphafive_tpu.models.evaluator import net_evaluator, rollout_evaluator
    from alphafive_tpu.train.evaluate import evaluate_vs
    from alphafive_tpu.train.loop import train
    from alphafive_tpu.utils.logging import MetricsLogger

    base = get_preset(args.preset)
    base = _apply_overrides(base, args.overrides)
    base = dataclasses.replace(
        base,
        mcts=dataclasses.replace(base.mcts, num_simulations=args.sims),
        train=dataclasses.replace(base.train, seed=args.seed,
                                  eval_every_iters=args.eval_every,
                                  eval_simulations=args.eval_sims,
                                  checkpoint_every_iters=10_000))

    nets = {}
    for variant in ("gumbel", "puct"):
        cfg = dataclasses.replace(
            base, mcts=dataclasses.replace(base.mcts,
                                           root_selection=variant
                                           if variant == "gumbel"
                                           else "puct"))
        t0 = time.time()
        if args.workdir_root:
            wd = os.path.join(args.workdir_root, variant)
            os.makedirs(wd, exist_ok=True)
            logger = MetricsLogger(wd, quiet=True, tensorboard=False)
        else:
            wd = tempfile.mkdtemp(prefix=f"abtrain_{variant}_")
            logger = MetricsLogger(None, quiet=True)
        carry, _ = train(cfg, workdir=wd, total_iters=args.iters,
                         logger=logger)
        ts = carry.train_state
        nets[variant] = net_evaluator(cfg.env, cfg.net, ts.params,
                                      ts.batch_stats)
        print(f"# trained {variant}: {time.time() - t0:.0f}s",
              file=sys.stderr)

    # --- neutral cross-play: classic exact search, no noise, both colors
    neutral = MCTSConfig(num_simulations=args.eval_sims)
    key = jax.random.key(args.seed + 1)
    res = evaluate_vs(base.env, neutral, nets["gumbel"], nets["puct"],
                      args.eval_sims, args.eval_sims, args.games, key,
                      opening_plies=args.opening_plies)

    # --- each net vs the pure-MCTS anchor
    anchor = rollout_evaluator(base.env)
    vs_anchor = {}
    for variant in ("gumbel", "puct"):
        k = jax.random.key(args.seed + 2)
        r = evaluate_vs(base.env, neutral, nets[variant], anchor,
                        args.eval_sims, args.anchor_rollouts,
                        args.games, k, opening_plies=args.opening_plies)
        vs_anchor[variant] = r["score"]

    print(json.dumps({
        "preset": args.preset, "overrides": args.overrides,
        "rules": base.env.rules, "board": base.env.board_size,
        "train_sims": args.sims, "iters": args.iters,
        "eval_sims": args.eval_sims, "games": args.games,
        "gumbel_vs_puct_net": res["score"],
        "wins": res["wins"], "losses": res["losses"],
        "draws": res["draws"],
        "anchor_rollouts": args.anchor_rollouts,
        "gumbel_vs_anchor": vs_anchor["gumbel"],
        "puct_vs_anchor": vs_anchor["puct"],
    }))


if __name__ == "__main__":
    main()
