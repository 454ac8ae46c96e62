"""Scalar (pure NumPy) Gomoku/Renju engine — the parity oracle.

The reference's board engine is a Python class holding a 2-D array with
`do_move`, legality checks, and a five-in-a-row scan over the 4 line
directions around the last stone (SURVEY.md §1 L1, §2 "Board engine").
`/root/reference` was empty (SURVEY.md §0), so this slow, obviously-correct
scalar engine plays the oracle role in the fixed-seed trajectory-parity tests
(SURVEY.md §4 "Parity (env)", BASELINE.json:5).

Conventions (shared with the vectorized env — keep in lockstep!):
  * stones: int8, +1 = black (moves first), -1 = white, 0 = empty
  * actions: flat index ``r * size + c``
  * winner: +1 / -1 / 0 (0 = draw or in progress)
  * rules "freestyle": a run of >= n_in_row wins (reference behavior)
  * rules "renju_lite": white wins with a run >= 5; black wins with a run of
    exactly 5; a black move whose longest run is >= 6 (overline) with no
    simultaneous exact-5 is a forbidden move and loses (winner = white).
  * rules "renju": renju_lite plus the full black forbidden moves —
    double-four and double-three (with the open-three legality probe) —
    implemented in ``_renju_black_outcome`` below; the one documented
    approximation is RIF's recursive forbidden-point exception
    (config.RENJU).
"""

from __future__ import annotations

import numpy as np

from alphafive_tpu.config import FREESTYLE, RENJU, RENJU_LITE

# Four scan directions: E, S, SE, SW (covers all 8 via +/- offsets).
DIRECTIONS = ((0, 1), (1, 0), (1, 1), (1, -1))

BLACK = 1
WHITE = -1


class ScalarGomoku:
    """One Gomoku game, scalar Python/NumPy. Slow by design."""

    def __init__(self, size: int = 15, n_in_row: int = 5,
                 rules: str = FREESTYLE):
        assert rules in (FREESTYLE, RENJU_LITE, RENJU)
        assert rules != RENJU or n_in_row == 5, (
            "full renju rules are defined for five-in-a-row")
        self.size = size
        self.n_in_row = n_in_row
        self.rules = rules
        self.num_actions = size * size
        self.reset()

    # -- state ------------------------------------------------------------
    def reset(self) -> None:
        self.board = np.zeros((self.size, self.size), dtype=np.int8)
        self.to_play = BLACK
        self.last_move = -1
        self.move_count = 0
        self.done = False
        self.winner = 0

    def copy(self) -> "ScalarGomoku":
        g = ScalarGomoku(self.size, self.n_in_row, self.rules)
        g.board = self.board.copy()
        g.to_play = self.to_play
        g.last_move = self.last_move
        g.move_count = self.move_count
        g.done = self.done
        g.winner = self.winner
        return g

    # -- moves ------------------------------------------------------------
    def legal_actions(self) -> np.ndarray:
        if self.done:
            return np.zeros((0,), dtype=np.int64)
        return np.flatnonzero(self.board.reshape(-1) == 0)

    def legal_mask(self) -> np.ndarray:
        if self.done:
            return np.zeros(self.num_actions, dtype=bool)
        return self.board.reshape(-1) == 0

    def step(self, action: int) -> None:
        assert not self.done, "stepping a finished game"
        r, c = divmod(int(action), self.size)
        assert self.board[r, c] == 0, "illegal move"
        player = self.to_play
        self.board[r, c] = player
        self.last_move = int(action)
        self.move_count += 1

        runs = self._runs_through(r, c, player)
        if self.rules == RENJU and player == BLACK:
            win, forbidden = self._renju_black_outcome(r, c, runs)
        else:
            win, forbidden = _classify(runs, self.n_in_row, self.rules,
                                       player)
        if win:
            self.done = True
            self.winner = player
        elif forbidden:
            self.done = True
            self.winner = -player
        elif self.move_count == self.num_actions:
            self.done = True
            self.winner = 0
        self.to_play = -player

    def _runs_through(self, r: int, c: int, player: int) -> list:
        """Longest run of `player` stones through (r, c), per direction."""
        runs = []
        for dr, dc in DIRECTIONS:
            n = 1
            for sgn in (1, -1):
                rr, cc = r + sgn * dr, c + sgn * dc
                while (0 <= rr < self.size and 0 <= cc < self.size
                       and self.board[rr, cc] == player):
                    n += 1
                    rr += sgn * dr
                    cc += sgn * dc
            runs.append(n)
        return runs

    # -- renju forbidden moves ---------------------------------------------
    def _renju_black_outcome(self, r: int, c: int, runs) -> tuple:
        """(win, forbidden) for a black stone just placed at (r, c) under
        full Renju rules: exact five wins (taking precedence over any
        forbid); otherwise overline, double-four, or double-three loses.

        Fours/threes are counted per line from the 11-cell windows through
        the new stone — the same operational definitions as the vectorized
        engine (env/vector.py), kept in lockstep:

          * a FOUR is a 5-window containing the new stone with 4 blacks +
            1 empty whose completion makes an EXACT five (cells adjacent
            to the window not black); a straight four (.BBBB.) matches two
            windows with the same stones and is deduplicated to one.
          * an open THREE is a 4-window containing the new stone with
            3 blacks + 1 empty, both window ends empty and the cells
            beyond the ends not black — i.e. filling the empty yields a
            straight four whose both completions are exact fives. The
            consecutive three (.BBB.) matches two windows and dedups.
          * RIF's recursive exception (a three only counts if its
            straight-four point is not itself forbidden) is intentionally
            NOT modeled — documented approximation (config.RENJU).
        """
        exact5 = any(n == 5 for n in runs)
        if exact5:
            return True, False
        overline = any(n >= 6 for n in runs)
        fours = threes = 0
        for dr, dc in DIRECTIONS:
            blk = np.zeros(11, dtype=bool)
            emp = np.zeros(11, dtype=bool)
            for w in range(11):
                o = w - 5
                rr, cc = r + o * dr, c + o * dc
                if 0 <= rr < self.size and 0 <= cc < self.size:
                    v = self.board[rr, cc]
                    blk[w] = v == BLACK
                    emp[w] = v == 0
            f, t = _renju_line_counts(blk, emp)
            fours += f
            threes += t
        return False, (overline or fours >= 2 or threes >= 2)

    # -- features ----------------------------------------------------------
    def features(self) -> np.ndarray:
        """[size, size, 4] float32 planes: own, opp, last-move, black-to-play.

        Matches the reference family's 4-plane encoder (SURVEY.md §2 "Board
        engine": own / opp / last move / colour-to-play).
        """
        f = np.zeros((self.size, self.size, 4), dtype=np.float32)
        f[:, :, 0] = self.board == self.to_play
        f[:, :, 1] = self.board == -self.to_play
        if self.last_move >= 0:
            r, c = divmod(self.last_move, self.size)
            f[r, c, 2] = 1.0
        f[:, :, 3] = 1.0 if self.to_play == BLACK else 0.0
        return f

    def render(self) -> str:
        sym = {0: ".", 1: "X", -1: "O"}
        rows = []
        rows.append("    " + " ".join(f"{c:2d}" for c in range(self.size)))
        for r in range(self.size):
            rows.append(f"{r:2d}  " + "  ".join(sym[int(v)]
                                                for v in self.board[r]))
        return "\n".join(rows)


def _renju_line_counts(blk: np.ndarray, emp: np.ndarray):
    """(fours, threes) made by the new black stone on one 11-cell line.

    `blk`/`emp` are booleans at offsets -5..+5 (index 5 = the new stone,
    off-board = neither). See ScalarGomoku._renju_black_outcome for the
    definitions. Plain NumPy on 11 cells — the obviously-correct oracle the
    vectorized engine is diffed against."""
    assert blk[5], "center must hold the new black stone"
    # --- fours: 5-windows s..s+4 (s in 1..5 keeps the center inside) ---
    cand4 = np.zeros(7, dtype=bool)  # indexed by s, padded to s+1 access
    for s in range(1, 6):
        w = slice(s, s + 5)
        if blk[w].sum() == 4 and emp[w].sum() == 1:
            if not blk[s - 1] and not blk[s + 5]:  # completion is exact 5
                cand4[s] = True
    fours = int(cand4.sum())
    for s in range(1, 5):  # straight four = same stones in s and s+1
        if cand4[s] and cand4[s + 1] and blk[s + 1:s + 5].all():
            fours -= 1
    # --- open threes: 4-windows t..t+3 (t in 2..5 keeps center inside) ---
    cand3 = np.zeros(7, dtype=bool)
    for t in range(2, 6):
        w = slice(t, t + 4)
        if blk[w].sum() == 3 and emp[w].sum() == 1:
            if (emp[t - 1] and emp[t + 4]          # straight-four ends open
                    and not blk[t - 2] and not blk[t + 5]):  # exact fives
                cand3[t] = True
    threes = int(cand3.sum())
    for t in range(2, 5):  # consecutive three = same stones in t and t+1
        if cand3[t] and cand3[t + 1] and blk[t + 1:t + 4].all():
            threes -= 1
    return fours, threes


def _classify(runs, n_in_row: int, rules: str, player: int):
    """(win, forbidden) from per-direction run lengths of the mover."""
    if rules == FREESTYLE:
        return max(runs) >= n_in_row, False
    # renju_lite
    if player == WHITE:
        return max(runs) >= n_in_row, False
    exact = any(n == n_in_row for n in runs)
    over = any(n > n_in_row for n in runs)
    if exact:  # a true five wins even if an overline coexists elsewhere
        return True, False
    return False, over
