"""Golden win-detection tables for the scalar oracle (SURVEY.md §4 Unit(env)).

Hand-written boards: rows, cols, diagonals, anti-diagonals, edge negatives,
overlines for the renju_lite variant.
"""

import numpy as np
import pytest

from alphafive_tpu.config import FREESTYLE, RENJU_LITE
from alphafive_tpu.env.scalar import ScalarGomoku


def play(game, moves):
    for m in moves:
        game.step(m)
    return game


def rc(size, pairs):
    return [r * size + c for r, c in pairs]


def test_row_win():
    g = ScalarGomoku(size=9)
    # black: (4,0)..(4,4); white: scattered row 0
    moves = []
    for i in range(4):
        moves.append(4 * 9 + i)      # black
        moves.append(i)               # white
    moves.append(4 * 9 + 4)          # black completes five
    play(g, moves)
    assert g.done and g.winner == 1


def test_col_win_white():
    g = ScalarGomoku(size=9)
    moves = []
    # black wanders (non-contiguous); white builds column 2
    for i, b in enumerate([0, 2, 4, 6, 8]):
        moves.append(8 * 9 + b)            # black
        moves.append(i * 9 + 2)            # white (wins on 5th)
    play(g, moves)
    assert g.done and g.winner == -1
    assert g.move_count == 10


def test_diag_and_antidiag():
    for pairs, w in [
        ([(i, i) for i in range(5)], 1),
        ([(i, 8 - i) for i in range(5)], 1),
    ]:
        g = ScalarGomoku(size=9)
        moves = []
        black = rc(9, pairs)
        white = rc(9, [(8, j) for j in range(4)])
        for i in range(4):
            moves += [black[i], white[i]]
        moves.append(black[4])
        play(g, moves)
        assert g.done and g.winner == w


def test_no_win_four():
    g = ScalarGomoku(size=9)
    moves = []
    for i in range(4):
        moves += [rc(9, [(4, i)])[0], rc(9, [(0, i)])[0]]
    play(g, moves)
    assert not g.done


def test_no_edge_wrap():
    # stones at (r, 7), (r, 8), (r+1, 0), ... must not join across the edge
    g = ScalarGomoku(size=9)
    cells = [(0, 7), (0, 8), (1, 0), (1, 1), (1, 2)]
    moves = []
    for i, cell in enumerate(cells[:-1]):
        moves.append(rc(9, [cell])[0])
        moves.append(rc(9, [(8, i)])[0])
    moves.append(rc(9, [cells[-1]])[0])
    play(g, moves)
    assert not g.done


def test_draw_full_board():
    # 3x3 board with n_in_row 4 can never be won -> draw at move 9
    g = ScalarGomoku(size=3, n_in_row=4)
    for a in range(9):
        g.step(a)
    assert g.done and g.winner == 0


def test_overline_wins_freestyle():
    g = ScalarGomoku(size=9, rules=FREESTYLE)
    # black builds X X X X _ X then fills the gap -> run of 6
    black = rc(9, [(4, 0), (4, 1), (4, 2), (4, 3), (4, 5)])
    white = rc(9, [(0, i) for i in (0, 2, 4, 6, 8)])
    moves = []
    for i in range(5):
        moves += [black[i], white[i]]
    moves.append(rc(9, [(4, 4)])[0])  # creates a 6-run
    play(g, moves)
    assert g.done and g.winner == 1


def test_overline_forbidden_renju_black():
    g = ScalarGomoku(size=9, rules=RENJU_LITE)
    black = rc(9, [(4, 0), (4, 1), (4, 2), (4, 3), (4, 5)])
    white = rc(9, [(0, i) for i in (0, 2, 4, 6, 8)])
    moves = []
    for i in range(5):
        moves += [black[i], white[i]]
    moves.append(rc(9, [(4, 4)])[0])  # black overline -> black loses
    play(g, moves)
    assert g.done and g.winner == -1


def test_exact_five_wins_renju_black():
    g = ScalarGomoku(size=9, rules=RENJU_LITE)
    black = rc(9, [(4, i) for i in range(4)])
    white = rc(9, [(0, i) for i in (0, 2, 4, 6)])
    moves = []
    for i in range(4):
        moves += [black[i], white[i]]
    moves.append(rc(9, [(4, 4)])[0])
    play(g, moves)
    assert g.done and g.winner == 1


def test_overline_ok_for_white_renju():
    g = ScalarGomoku(size=9, rules=RENJU_LITE)
    white = rc(9, [(4, 0), (4, 1), (4, 2), (4, 3), (4, 5)])
    black = rc(9, [(0, i) for i in (0, 2, 4, 6, 8)] + [(1, 0)])
    moves = []
    for i in range(5):
        moves += [black[i], white[i]]
    moves.append(black[5])
    moves.append(rc(9, [(4, 4)])[0])  # white 6-run -> still a win
    play(g, moves)
    assert g.done and g.winner == -1


def test_features_encoding():
    g = ScalarGomoku(size=5, n_in_row=4)
    g.step(12)  # black center
    f = g.features()
    assert f.shape == (5, 5, 4)
    # white to play: own plane shows white stones (none), opp shows black
    assert f[:, :, 0].sum() == 0
    assert f[2, 2, 1] == 1 and f[:, :, 1].sum() == 1
    assert f[2, 2, 2] == 1 and f[:, :, 2].sum() == 1
    assert f[:, :, 3].sum() == 0  # white to play
    g.step(0)
    f = g.features()
    assert f[:, :, 3].sum() == 25  # black to play
    assert f[2, 2, 0] == 1 and f[0, 0, 1] == 1


def test_legal_actions_shrink():
    g = ScalarGomoku(size=5, n_in_row=4)
    assert len(g.legal_actions()) == 25
    g.step(7)
    assert len(g.legal_actions()) == 24
    assert 7 not in g.legal_actions()


def test_illegal_move_raises():
    g = ScalarGomoku(size=5, n_in_row=4)
    g.step(7)
    with pytest.raises(AssertionError):
        g.step(7)
