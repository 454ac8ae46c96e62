"""Evaluation: pit two searchers in lockstep games (SURVEY.md §3.5).

The reference's `policy_evaluate` plays n games of current-net MCTS vs a
pure-MCTS anchor, swapping who moves first, and gates promotion on win rate.
TPU-first: all games of one color assignment run as one batched
`lax.while_loop` — both players are array-MCTS instances (the anchor just
uses the net-free rollout evaluator), searches are greedy (no noise, τ→0).

Because eval games never auto-reset, every live env has the same ply parity,
so "whose turn" is a scalar `lax.cond` between the two searches.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from alphafive_tpu.config import EnvConfig, MCTSConfig
from alphafive_tpu.env import vector
from alphafive_tpu.mcts import search


def play_games(env_cfg: EnvConfig, mcts_cfg: MCTSConfig,
               eval_black: Callable, eval_white: Callable,
               sims_black: int, sims_white: int,
               num_games: int, key: jax.Array):
    """Black = eval_black searcher, white = eval_white. Returns final state.

    Jit-compile the returned call (both searches trace once inside a cond).
    """
    state = vector.init(env_cfg, num_games)

    def do_search(evaluate, sims, st, k):
        return search.run_mcts(env_cfg, mcts_cfg, evaluate, st, k,
                               num_simulations=sims, add_noise=False)

    def cond_fn(c):
        st, _, _ = c
        return ~st.done.all()

    def body(c):
        st, key, ply = c
        key, ks = jax.random.split(key)
        res = jax.lax.cond(
            ply % 2 == 0,
            lambda s, k: do_search(eval_black, sims_black, s, k),
            lambda s, k: do_search(eval_white, sims_white, s, k),
            st, ks)
        # greedy action; frozen envs step harmlessly (no-op)
        action = jnp.argmax(res.visits, axis=-1).astype(jnp.int32)
        st = vector.step(env_cfg, st, action)
        return st, key, ply + 1

    final, _, _ = jax.lax.while_loop(
        cond_fn, body, (state, key, jnp.int32(0)))
    return final


def evaluate_vs(env_cfg: EnvConfig, mcts_cfg: MCTSConfig,
                eval_a: Callable, eval_b: Callable,
                sims_a: int, sims_b: int, num_games: int,
                key: jax.Array) -> Dict[str, float]:
    """A plays black in half the games, white in the other half.

    Returns win/draw/loss counts and score for A (host floats).
    """
    half = max(num_games // 2, 1)
    k1, k2 = jax.random.split(key)

    run_ab = jax.jit(functools.partial(
        play_games, env_cfg, mcts_cfg, eval_a, eval_b, sims_a, sims_b, half))
    run_ba = jax.jit(functools.partial(
        play_games, env_cfg, mcts_cfg, eval_b, eval_a, sims_b, sims_a, half))

    fa = run_ab(k1)  # A is black
    fb = run_ba(k2)  # A is white
    wa = np.asarray(fa.winner)
    wb = np.asarray(fb.winner)
    wins = int((wa == 1).sum() + (wb == -1).sum())
    losses = int((wa == -1).sum() + (wb == 1).sum())
    draws = int((wa == 0).sum() + (wb == 0).sum())
    n = wins + losses + draws
    return {
        "games": n,
        "wins": wins,
        "losses": losses,
        "draws": draws,
        "score": (wins + 0.5 * draws) / max(n, 1),
    }
