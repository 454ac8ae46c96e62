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
    Full Renju double-three/double-four forbids are intentionally out of
    scope (documented in SURVEY.md §5.7 as a memory-stress variant).
"""

from __future__ import annotations

import numpy as np

from alphafive_tpu.config import FREESTYLE, RENJU_LITE

# Four scan directions: E, S, SE, SW (covers all 8 via +/- offsets).
DIRECTIONS = ((0, 1), (1, 0), (1, 1), (1, -1))

BLACK = 1
WHITE = -1


class ScalarGomoku:
    """One Gomoku game, scalar Python/NumPy. Slow by design."""

    def __init__(self, size: int = 15, n_in_row: int = 5,
                 rules: str = FREESTYLE):
        assert rules in (FREESTYLE, RENJU_LITE)
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
        win, forbidden = _classify(runs, self.n_in_row, self.rules, player)
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
