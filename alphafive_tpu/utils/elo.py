"""Elo tracking against a pure-MCTS anchor ladder (SURVEY.md §4, §3.5).

The reference evaluates against pure MCTS and raises the anchor's playout
budget once the net wins every game. We keep an explicit ladder: anchors are
pure-MCTS players at doubling rollout budgets, each assigned a fixed rating
(anchor 0 = 0 Elo by convention).

The per-doubling step is MEASURED, not assumed: benchmarks/calibrate_elo.py
played a 64-game round-robin between anchors at 200..3200 rollouts on 9×9
(both colors, canonical exact search). Pairwise gaps: adjacent doublings
163/163/163/221 Elo (plus a 221 re-measurement at a different seed), 2-level
skips 470/470; the least-squares fit over all pairs gives per-doubling steps
[208, 232, 201, 221], mean ≈ 215. Round-1's assumed +120 was ~1.8× too low —
absolute Elo numbers from that round's history understate anchor strength;
relative curves are unaffected. Full table in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional


ANCHOR_STEP_ELO = 215.0  # measured (see module docstring); was 120 assumed


@dataclasses.dataclass
class LadderState:
    level: int = 0                 # current anchor index
    base_rollouts: int = 200       # anchor 0 budget
    promote_score: float = 0.85    # move up when score >= this
    max_rollouts: int = 12_800     # stop doubling here (eval cost ∝ budget)
    history: List[dict] = dataclasses.field(default_factory=list)

    @property
    def anchor_rollouts(self) -> int:
        return self.base_rollouts * (2 ** self.level)

    @property
    def anchor_elo(self) -> float:
        return ANCHOR_STEP_ELO * self.level


def performance_elo(score: float, anchor_elo: float,
                    games: Optional[int] = None) -> float:
    """Rating implied by `score` against an `anchor_elo` opponent.

    A sweep (score exactly 0 or 1) implies an unbounded rating; some clamp
    is needed. When `games` is given, the score is clamped at the SAMPLE
    RESOLUTION — [1/(2n), 1 − 1/(2n)] for n games (the Haldane-style
    half-count correction) — so the estimate is monotone and nearly
    continuous in the win count: with n=64, a 64–0 sweep maps to
    anchor+841 and 63–1 to anchor+720, instead of the fixed 1e-3 clamp's
    anchor+1200 vs anchor+720 cliff (the round-4 19×19 ladder.json
    artifact where one lost game "dropped" 480 Elo — it was the clamp
    moving, not the net). Without `games` the legacy 1e-3 clamp applies
    (keeps old recorded histories interpretable).
    """
    lo = 1.0 / (2.0 * games) if games else 1e-3
    s = min(max(score, lo), 1 - lo)
    return anchor_elo - 400.0 * math.log10(1.0 / s - 1.0)


def update_ladder(ladder: LadderState, result: dict,
                  step: int) -> Optional[float]:
    """Record an eval result; maybe climb the ladder. Returns Elo estimate."""
    elo = performance_elo(result["score"], ladder.anchor_elo,
                          games=result.get("games"))
    ladder.history.append({
        "step": step, "level": ladder.level,
        "anchor_rollouts": ladder.anchor_rollouts, **result, "elo": elo,
    })
    if (result["score"] >= ladder.promote_score
            and ladder.anchor_rollouts * 2 <= ladder.max_rollouts):
        ladder.level += 1
    return elo
