"""Full Renju forbidden-move rules: golden positions on BOTH engines
(scalar oracle and vectorized), plus 19x19 trajectory parity
(VERDICT round-1 missing #4; BASELINE.json:11 names a Renju-rules config).

Definitions under test (config.RENJU, env/scalar.py):
  * black exact five wins, taking precedence over any forbid
  * black overline, double-four, or double-three loses (winner = white)
  * white is unrestricted and wins with >= 5
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphafive_tpu.config import EnvConfig, RENJU
from alphafive_tpu.env import vector
from alphafive_tpu.env.scalar import ScalarGomoku

SIZE = 15
CFG = EnvConfig(board_size=SIZE, rules=RENJU)
step_j = jax.jit(vector.step, static_argnums=0)


def rc(r, c):
    return r * SIZE + c


def make_position(blacks, whites, to_play=1):
    """Same position in both engines (stones placed directly — parity of
    counts is irrelevant to the rules under test)."""
    g = ScalarGomoku(SIZE, 5, RENJU)
    board = np.zeros((SIZE, SIZE), np.int8)
    for r, c in blacks:
        board[r, c] = 1
    for r, c in whites:
        board[r, c] = -1
    g.board = board
    g.to_play = to_play
    g.move_count = len(blacks) + len(whites)

    st = vector.EnvState(
        board=jnp.asarray(board.reshape(1, -1)),
        to_play=jnp.array([to_play], jnp.int8),
        last_move=jnp.array([-1], jnp.int32),
        move_count=jnp.array([g.move_count], jnp.int32),
        done=jnp.array([False]),
        winner=jnp.array([0], jnp.int8),
    )
    return g, st


def both_step(g, st, r, c):
    """Step both engines; assert identical outcome; return (done, winner)."""
    g.step(rc(r, c))
    st = step_j(CFG, st, jnp.array([rc(r, c)]))
    assert bool(st.done[0]) == g.done
    assert int(st.winner[0]) == g.winner
    return g.done, g.winner


def test_double_three_forbidden():
    g, st = make_position(
        blacks=[(7, 5), (7, 6), (5, 7), (6, 7)],
        whites=[(0, 0), (0, 1), (0, 2), (0, 3)])
    done, winner = both_step(g, st, 7, 7)
    assert done and winner == -1  # black forbidden -> white wins


def test_double_four_forbidden():
    g, st = make_position(
        blacks=[(7, 3), (7, 4), (7, 5), (4, 7), (5, 7), (6, 7)],
        whites=[(0, c) for c in range(6)])
    done, winner = both_step(g, st, 7, 7)
    assert done and winner == -1


def test_same_line_double_four_forbidden():
    # row: B B B . * . B B B — the move at * makes TWO fours in ONE line
    # ({1,2,3,5} completable at 4, and {5,7,8,9} completable at 6)
    g, st = make_position(
        blacks=[(7, 1), (7, 2), (7, 3), (7, 7), (7, 8), (7, 9)],
        whites=[(0, c) for c in range(6)])
    done, winner = both_step(g, st, 7, 5)
    assert done and winner == -1


def test_four_three_is_legal():
    g, st = make_position(
        blacks=[(7, 4), (7, 5), (7, 6), (5, 7), (6, 7)],
        whites=[(7, 3), (0, 0), (0, 1), (0, 2)])
    done, winner = both_step(g, st, 7, 7)
    assert not done and winner == 0  # one four + one three: legal


def test_straight_four_counts_once():
    g, st = make_position(
        blacks=[(7, 4), (7, 5), (7, 6)],
        whites=[(0, 0), (0, 1), (0, 2)])
    done, winner = both_step(g, st, 7, 7)
    assert not done  # a single straight four is not a double-four


def test_exact_five_beats_forbids():
    # completing five while also making a crossing double-three: WIN
    g, st = make_position(
        blacks=[(7, 3), (7, 4), (7, 5), (7, 6), (5, 7), (6, 7)],
        whites=[(0, c) for c in range(6)])
    done, winner = both_step(g, st, 7, 7)
    assert done and winner == 1


def test_overline_forbidden_full_renju():
    g, st = make_position(
        blacks=[(7, 2), (7, 3), (7, 4), (7, 5), (7, 6)],
        whites=[(0, c) for c in range(5)])
    done, winner = both_step(g, st, 7, 7)
    assert done and winner == -1  # 6 in a row, no simultaneous exact five


def test_white_unrestricted():
    # white double-three: legal; white overline: win
    g, st = make_position(
        blacks=[(0, c) for c in range(4)],
        whites=[(7, 5), (7, 6), (5, 7), (6, 7)], to_play=-1)
    done, winner = both_step(g, st, 7, 7)
    assert not done  # white may make double threes

    g, st = make_position(
        blacks=[(0, c) for c in range(5)],
        whites=[(7, 2), (7, 3), (7, 4), (7, 5), (7, 6)], to_play=-1)
    done, winner = both_step(g, st, 7, 7)
    assert done and winner == -1  # white overline wins


def test_broken_three_counts():
    # B . B B (fill the gap later): X at (7,7) with blacks (7,5), (7,8):
    # 7,5 . 7,7 7,8 -> three {5,7,8} needs gap 6 for a straight four
    g, st = make_position(
        blacks=[(7, 5), (7, 8), (5, 7), (6, 7)],
        whites=[(0, 0), (0, 1), (0, 2), (0, 3)])
    done, winner = both_step(g, st, 7, 7)
    assert done and winner == -1  # broken three + column three = double


def test_edge_blocked_three_not_open():
    """A three hugging the edge can't form a straight four whose BOTH
    completions are exact fives — it is not an open three, so a crossing
    ordinary three does not make a double-three."""
    # row three at (0,0),(0,1),(0,2)+move: filling either end: col -1 is
    # off-board -> the left five can never exist -> not open
    g, st = make_position(
        blacks=[(0, 0), (0, 1), (5, 3), (6, 3)],
        whites=[(14, 0), (14, 1), (14, 2), (14, 3)])
    done, winner = both_step(g, st, 0, 2)
    # row {0,1,2}: straight four would need (0,-1)... only completion at
    # (0,3) -> the resulting four is simple, not straight -> no open three
    # column three at (5,3),(6,3) is not through this move either way.
    assert not done


def test_edge_open_three_counts():
    """Control for the edge case above: the same shape one cell inward IS
    an open three, and with a crossing open three the move is forbidden."""
    g, st = make_position(
        blacks=[(7, 5), (7, 6), (5, 7), (4, 7)],
        whites=[(14, 0), (14, 1), (14, 2), (14, 3)])
    # column: blacks (4,7),(5,7) + move (7,7)? that's {4,5,7} rows -> gap 6
    done, winner = both_step(g, st, 7, 7)
    assert done and winner == -1  # row .BBB. + column broken three


@pytest.mark.parametrize("seed", [0, 1])
def test_trajectory_parity_renju_19x19(seed):
    """Fixed-seed random playouts at 19x19 full renju: vector == scalar on
    every field until all games finish (VERDICT round-1 item 4)."""
    cfg = EnvConfig(board_size=19, rules=RENJU)
    e = 4
    st = vector.init(cfg, e)
    games = [ScalarGomoku(19, 5, RENJU) for _ in range(e)]
    rng = np.random.default_rng(seed)
    sj = jax.jit(vector.step, static_argnums=0)

    for ply in range(19 * 19):
        if all(g.done for g in games):
            break
        actions = np.zeros(e, dtype=np.int32)
        for i, g in enumerate(games):
            if g.done:
                continue
            la = g.legal_actions()
            actions[i] = la[rng.integers(len(la))]
        st = sj(cfg, st, jnp.asarray(actions))
        for i, g in enumerate(games):
            if not g.done:
                g.step(int(actions[i]))
        h = jax.tree.map(np.asarray, st)
        for i, g in enumerate(games):
            np.testing.assert_array_equal(h.board[i].reshape(19, 19),
                                          g.board, err_msg=f"env {i} ply {ply}")
            assert bool(h.done[i]) == g.done, (i, ply)
            assert int(h.winner[i]) == g.winner, (i, ply)
    assert all(g.done for g in games)
    # random renju games MUST hit forbidden endings sometimes; make sure
    # the variant actually exercised black losses
    # (not asserted per-seed: aggregated sanity only)
