"""Packed-tree Pallas search vs the XLA search: identical visit counts.

Runs the descent kernel in interpret mode on CPU (SURVEY.md §4 "Unit
(net)" pattern: Pallas kernel vs pure-XLA reference `allclose` under
interpret mode). The oracle-parity suite (test_mcts.py) pins the XLA
search to the NumPy reference, so equality here gives kernel → oracle
parity transitively.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphafive_tpu.config import EnvConfig, MCTSConfig
from alphafive_tpu.env import vector
from alphafive_tpu.mcts import search
from alphafive_tpu.mcts.search_packed import run_mcts_packed
from alphafive_tpu.models.evaluator import uniform_evaluator


def frozen_net_evaluator(env_cfg, key):
    """Deterministic pseudo-random logits/values (position-dependent)."""
    a = env_cfg.num_actions
    w_l = jax.random.normal(key, (a, a), jnp.float32) * 0.3
    w_v = jax.random.normal(jax.random.fold_in(key, 1), (a,),
                            jnp.float32) * 0.1

    def evaluate(board, to_play, last, k):
        del last, k
        x = board.astype(jnp.float32) * to_play[:, None].astype(jnp.float32)
        logits = x @ w_l
        value = jnp.tanh(x @ w_v)
        return logits, value

    return evaluate


@pytest.mark.parametrize("size,sims,plies", [(5, 24, 3), (7, 40, 5)])
def test_packed_matches_xla(size, sims, plies):
    env_cfg = EnvConfig(board_size=size, n_in_row=4)
    mcts_cfg = MCTSConfig(num_simulations=sims)
    ev = frozen_net_evaluator(env_cfg, jax.random.key(7))
    e = 4
    state = vector.init(env_cfg, e)

    run_x = jax.jit(functools.partial(
        search.run_mcts, env_cfg, mcts_cfg, ev, add_noise=False))
    run_p = jax.jit(functools.partial(
        run_mcts_packed, env_cfg, mcts_cfg, ev, add_noise=False,
        interpret=True))

    key = jax.random.key(0)
    for ply in range(plies):
        key, ks, ka = jax.random.split(key, 3)
        rx = run_x(state, ks)
        rp = run_p(state, ks)
        np.testing.assert_array_equal(np.asarray(rx.visits),
                                      np.asarray(rp.visits),
                                      err_msg=f"ply {ply}")
        np.testing.assert_allclose(np.asarray(rx.root_value),
                                   np.asarray(rp.root_value), atol=1e-5)
        act = search.sample_actions(
            ka, rx.visits / jnp.maximum(rx.visits.sum(-1, keepdims=True),
                                        1.0))
        state = vector.step(env_cfg, state, act)
        state = vector.reset_where(env_cfg, state, state.done)


def test_packed_with_depth_cap_and_noise():
    """Depth-capped + noisy search agrees between implementations."""
    env_cfg = EnvConfig(board_size=5, n_in_row=4)
    mcts_cfg = MCTSConfig(num_simulations=32, max_depth=4)
    ev = uniform_evaluator(env_cfg)
    state = vector.init(env_cfg, 3)
    key = jax.random.key(3)

    rx = jax.jit(functools.partial(
        search.run_mcts, env_cfg, mcts_cfg, ev, add_noise=True))(state, key)
    rp = jax.jit(functools.partial(
        run_mcts_packed, env_cfg, mcts_cfg, ev, add_noise=True,
        interpret=True))(state, key)
    np.testing.assert_array_equal(np.asarray(rx.visits),
                                  np.asarray(rp.visits))


def test_select_impl_dispatch():
    """MCTSConfig.select_impl='pallas' routes through the packed search."""
    env_cfg = EnvConfig(board_size=5, n_in_row=4)
    cfg = MCTSConfig(num_simulations=16, select_impl="pallas")
    ev = uniform_evaluator(env_cfg)
    state = vector.init(env_cfg, 2)
    res = jax.jit(functools.partial(
        search.run_mcts, env_cfg, cfg, ev, add_noise=False))(
            state, jax.random.key(0))
    assert float(res.visits.sum()) > 0
