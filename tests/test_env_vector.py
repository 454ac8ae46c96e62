"""Vectorized env: golden cases, invariants, and fixed-seed trajectory parity
against the scalar oracle (SURVEY.md §4 "Parity (env)", BASELINE.json:5,7).
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphafive_tpu.config import EnvConfig, FREESTYLE, RENJU_LITE
from alphafive_tpu.env import vector
from alphafive_tpu.env.scalar import ScalarGomoku


# jit everything (eager dispatch is very slow on the 1-core CI box);
# EnvConfig is a frozen dataclass -> hashable static arg, cached across tests.
step_j = jax.jit(vector.step, static_argnums=0)
reset_j = jax.jit(vector.reset_where, static_argnums=0)
mask_j = jax.jit(vector.legal_mask)
feats_j = jax.jit(vector.state_features, static_argnums=0)
runs_j = jax.jit(vector.runs_through, static_argnums=0)


def make(cfg, e=1):
    return vector.init(cfg, e)


def np_state(state, i=0):
    return jax.tree.map(lambda x: np.asarray(x[i]), state)


def test_step_basic():
    cfg = EnvConfig(board_size=9)
    st = make(cfg, 2)
    st = step_j(cfg, st, jnp.array([40, 0]))
    assert st.board[0, 40] == 1 and st.board[1, 0] == 1
    assert (st.to_play == -1).all()
    assert not bool(st.done.any())


def test_vector_row_win_matches_scalar():
    cfg = EnvConfig(board_size=9)
    st = make(cfg)
    g = ScalarGomoku(9)
    moves = []
    for i in range(4):
        moves += [4 * 9 + i, i]
    moves.append(4 * 9 + 4)
    for m in moves:
        g.step(m)
        st = step_j(cfg, st, jnp.array([m]))
    assert bool(st.done[0]) and int(st.winner[0]) == 1
    assert g.done and g.winner == 1
    np.testing.assert_array_equal(np.asarray(st.board[0]).reshape(9, 9),
                                  g.board)


def test_done_env_frozen():
    cfg = EnvConfig(board_size=5, n_in_row=4)
    st = make(cfg)
    wins = [0, 20, 1, 21, 2, 22, 3]  # black wins row 0
    for m in wins:
        st = step_j(cfg, st, jnp.array([m]))
    assert bool(st.done[0])
    snapshot = jax.tree.map(np.asarray, st)
    st2 = step_j(cfg, st, jnp.array([9]))
    chex.assert_trees_all_equal(jax.tree.map(np.asarray, st2), snapshot)


def test_reset_where():
    cfg = EnvConfig(board_size=5, n_in_row=4)
    st = make(cfg, 2)
    st = step_j(cfg, st, jnp.array([3, 4]))
    st = reset_j(cfg, st, jnp.array([True, False]))
    assert st.board[0].sum() == 0 and st.board[1].sum() == 1
    assert int(st.to_play[0]) == 1 and int(st.to_play[1]) == -1
    assert int(st.last_move[0]) == -1 and int(st.last_move[1]) == 4


def test_features_match_scalar():
    cfg = EnvConfig(board_size=5, n_in_row=4)
    st = make(cfg)
    g = ScalarGomoku(5, 4)
    for m in [12, 0, 13]:
        g.step(m)
        st = step_j(cfg, st, jnp.array([m]))
    fv = np.asarray(feats_j(cfg, st))[0]
    np.testing.assert_array_equal(fv, g.features())


@pytest.mark.parametrize("rules,size,n", [
    (FREESTYLE, 9, 5),
    (FREESTYLE, 5, 4),
    (RENJU_LITE, 5, 4),
    (RENJU_LITE, 9, 5),  # renju at real n_in_row (overline reachable)
])
def test_trajectory_parity_random_games(rules, size, n):
    """Fixed-seed random playouts: vector env == scalar oracle, every field,
    every ply, until every game finishes."""
    cfg = EnvConfig(board_size=size, n_in_row=n, rules=rules)
    e = 8
    st = make(cfg, e)
    games = [ScalarGomoku(size, n, rules) for _ in range(e)]
    rng = np.random.default_rng(42)

    for ply in range(size * size):
        legal = np.asarray(mask_j(st))
        actions = np.zeros(e, dtype=np.int32)
        for i, g in enumerate(games):
            if g.done:
                # frozen env: any action is a no-op; parity still must hold
                actions[i] = 0
                continue
            la = g.legal_actions()
            np.testing.assert_array_equal(np.flatnonzero(legal[i]), la)
            actions[i] = la[rng.integers(len(la))]
        if all(g.done for g in games):
            break
        st = step_j(cfg, st, jnp.asarray(actions))
        for i, g in enumerate(games):
            if not g.done:
                g.step(int(actions[i]))
        # full-state parity at every ply (one host transfer per ply)
        h = jax.tree.map(np.asarray, st)
        for i, g in enumerate(games):
            np.testing.assert_array_equal(h.board[i].reshape(size, size),
                                          g.board)
            assert bool(h.done[i]) == g.done, (i, ply)
            assert int(h.winner[i]) == g.winner
            assert int(h.to_play[i]) == g.to_play
            assert int(h.move_count[i]) == g.move_count
            assert int(h.last_move[i]) == g.last_move
    assert all(g.done for g in games), "not every game finished"


def test_runs_through_overline_measured():
    cfg = EnvConfig(board_size=9)
    st = make(cfg)
    board = st.board.at[0, jnp.array([36, 37, 38, 40, 41])].set(1)
    board = board.at[0, 39].set(1)  # the joining stone
    runs = runs_j(cfg, board, jnp.array([39]), jnp.array([1, ]))
    assert int(runs[0, 0]) == 6  # horizontal direction measures the 6-run
