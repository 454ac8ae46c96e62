"""Subtree reuse vs fresh-tree MCTS: equal per-move-budget strength A/B.

The reference family re-roots its tree after every move (update_with_move)
so earlier simulations carry over; the array search uses a fresh tree per
move (the standard batched-MCTS design). This experiment settles what that
trade costs at equal per-move simulation budget (round-1 VERDICT item 5):
scalar ReuseMCTS vs fresh run_mcts_reference, same net, greedy play,
random openings, both color assignments.

    python benchmarks/ab_subtree_reuse.py --games 32 --sims 100

Prints one JSON line with the reuse side's score. Runs on CPU (scalar
Python MCTS is the host-side oracle; the net runs as jitted batch-1 calls).
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
    ap.add_argument("--model", default="pretrained/9x9")
    ap.add_argument("--games", type=int, default=32)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--opening-plies", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from alphafive_tpu.env.scalar import ScalarGomoku
    from alphafive_tpu.mcts.reference import ReuseMCTS, run_mcts_reference
    from alphafive_tpu.models.evaluator import net_evaluator
    from alphafive_tpu.train import checkpoint as ckpt

    params, batch_stats, cfg = ckpt.load_model(args.model)
    env_cfg = cfg.env
    ev_vec = net_evaluator(env_cfg, cfg.net, params, batch_stats)
    ev_jit = jax.jit(lambda b, tp, lm: ev_vec(b, tp, lm, None))

    def ev(board_flat, to_play, last):
        logits, v = ev_jit(jnp.asarray(board_flat[None]),
                           jnp.asarray([to_play], jnp.int8),
                           jnp.asarray([last], jnp.int32))
        return np.asarray(logits)[0], float(v[0])

    rng = np.random.default_rng(args.seed)

    def opening(seed_game):
        g = ScalarGomoku(env_cfg.board_size, env_cfg.n_in_row, env_cfg.rules)
        for _ in range(args.opening_plies):
            la = g.legal_actions()
            g.step(int(la[rng.integers(len(la))]))
        return g

    def play(g, reuse_is_black):
        reuse = ReuseMCTS(ev, c_puct=5.0)
        while not g.done:
            is_reuse_turn = (g.to_play == 1) == reuse_is_black
            if is_reuse_turn:
                n = reuse.search(g, args.sims)
            else:
                n, _ = run_mcts_reference(g, ev, args.sims, c_puct=5.0)
            a = int(np.argmax(n))
            g.step(a)
            reuse.update_with_move(a)
        return g.winner

    t0 = time.time()
    wins = losses = draws = 0
    half = args.games // 2
    openings = [opening(i) for i in range(half)]
    for i, g0 in enumerate(openings):
        for reuse_black in (True, False):
            w = play(g0.copy(), reuse_black)
            if w == 0:
                draws += 1
            elif (w == 1) == reuse_black:
                wins += 1
            else:
                losses += 1

    n = wins + losses + draws
    print(json.dumps({
        "experiment": "subtree_reuse_vs_fresh",
        "model": args.model, "board": env_cfg.board_size,
        "sims_per_move": args.sims, "games": n,
        "reuse_wins": wins, "reuse_losses": losses, "draws": draws,
        "reuse_score": (wins + 0.5 * draws) / max(n, 1),
        "seconds": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
