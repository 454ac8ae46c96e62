"""Eval matches + Elo ladder (SURVEY.md §3.5, §4 "Learning-curve/Elo")."""

import math

import jax
import numpy as np
import pytest

from alphafive_tpu.config import EnvConfig, MCTSConfig
from alphafive_tpu.models.evaluator import rollout_evaluator, uniform_evaluator
from alphafive_tpu.train.evaluate import evaluate_vs
from alphafive_tpu.utils import elo


def test_stronger_search_wins():
    """Pure-MCTS with 96 sims should beat 4-sim search on 5x5/4-in-a-row."""
    env_cfg = EnvConfig(board_size=5, n_in_row=4)
    mcts_cfg = MCTSConfig()
    strong = rollout_evaluator(env_cfg, num_rollouts=1)
    weak = uniform_evaluator(env_cfg)
    res = evaluate_vs(env_cfg, mcts_cfg, strong, weak, 96, 4, 8,
                      jax.random.key(0))
    assert res["games"] == 8
    assert res["wins"] + res["losses"] + res["draws"] == 8
    assert res["score"] >= 0.65, res


def test_evaluate_counts_consistent():
    env_cfg = EnvConfig(board_size=5, n_in_row=4)
    mcts_cfg = MCTSConfig()
    u = uniform_evaluator(env_cfg)
    res = evaluate_vs(env_cfg, mcts_cfg, u, u, 8, 8, 6, jax.random.key(1))
    assert res["games"] == 6
    assert 0.0 <= res["score"] <= 1.0


def test_evaluate_rejects_odd_games():
    """Odd game counts can't give both sides equal colors — hard error
    (round-1 VERDICT weak #7: silent rounding was a trap)."""
    env_cfg = EnvConfig(board_size=5, n_in_row=4)
    u = uniform_evaluator(env_cfg)
    with pytest.raises(ValueError):
        evaluate_vs(env_cfg, MCTSConfig(), u, u, 4, 4, 5, jax.random.key(0))


def test_evaluate_int16_preset_big_anchor():
    """Perf presets store W as int16 (budget-capped at 511 sims); eval vs a
    big pure-MCTS anchor must not crash — it falls back to exact float32
    (round-1 ADVICE high: training crashed at the 800-rollout ladder level).
    """
    env_cfg = EnvConfig(board_size=5, n_in_row=4)
    mcts_cfg = MCTSConfig(value_dtype="int16", prior_dtype="bfloat16",
                          max_depth=16)
    u = uniform_evaluator(env_cfg)
    res = evaluate_vs(env_cfg, mcts_cfg, u, u, 4, 550, 2, jax.random.key(2))
    assert res["games"] == 2


def test_ladder_checkpoint_roundtrip_keeps_max_rollouts():
    """LadderState survives the JSON save/restore path including fields
    added after old checkpoints were written (round-1 ADVICE low)."""
    import dataclasses as dc
    from alphafive_tpu.train.checkpoint import _ladder_from_dict
    lad = elo.LadderState(level=2, base_rollouts=100, promote_score=0.9,
                          max_rollouts=3_200, history=[{"step": 1}])
    back = _ladder_from_dict(dc.asdict(lad))
    assert back == lad
    # old checkpoint without the field -> default, not a crash
    old = dc.asdict(lad)
    del old["max_rollouts"]
    assert _ladder_from_dict(old).max_rollouts == elo.LadderState().max_rollouts


def test_random_openings_and_per_side_configs():
    """Opening randomization produces distinct live boards with black to
    move; per-side MCTS configs actually reach each player's search."""
    import dataclasses
    from alphafive_tpu.train.evaluate import random_openings

    env_cfg = EnvConfig(board_size=7, n_in_row=5)
    st = random_openings(env_cfg, 8, 4, jax.random.key(0))
    assert not bool(np.asarray(st.done).any())
    assert (np.asarray(st.move_count) == 4).all()
    assert (np.asarray(st.to_play) == 1).all()
    boards = np.asarray(st.board)
    assert len({b.tobytes() for b in boards}) > 1  # distinct openings

    # per-side configs: a 1-sim side vs a 64-sim side (same uniform
    # evaluator) — the budgeted side must dominate, proving the
    # config/budget plumbing reaches the right player
    u = uniform_evaluator(env_cfg)
    base = MCTSConfig()
    res = evaluate_vs(env_cfg, base, u, u, 64, 1, 8, jax.random.key(1),
                      mcts_a=dataclasses.replace(base, max_depth=16),
                      mcts_b=dataclasses.replace(base, max_depth=2),
                      opening_plies=4)
    assert res["games"] == 8
    assert res["score"] >= 0.6, res


def test_elo_math():
    assert elo.performance_elo(0.5, 0.0) == pytest.approx(0.0)
    assert elo.performance_elo(0.75, 0.0) == pytest.approx(190.85, abs=0.1)
    # monotone in score; shift by anchor
    assert (elo.performance_elo(0.9, 100.0)
            > elo.performance_elo(0.6, 100.0) > 100.0 - 80)


def test_elo_sample_resolution_clamp():
    """Sweep Elo is clamped at the SAMPLE resolution, not a fixed 1e-3:
    the round-4 19×19 ladder artifact recorded a 480-point "drop" going
    from a 64–0 sweep to 63–1 purely because the fixed clamp valued a
    sweep at +1200 while 63/64 computes to +720. Games-aware clamping
    makes the estimate monotone and nearly continuous in the win count."""
    sweep = elo.performance_elo(1.0, 0.0, games=64)
    near = elo.performance_elo(63 / 64, 0.0, games=64)
    assert sweep > near  # monotone in wins
    assert sweep - near < 150  # no cliff (legacy clamp gap was ~480)
    # more games -> tighter resolution -> higher (but still finite) bound
    assert elo.performance_elo(1.0, 0.0, games=256) > sweep
    # legacy behavior without games is unchanged (old histories)
    assert elo.performance_elo(1.0, 0.0) == pytest.approx(
        -400.0 * math.log10(1.0 / 0.999 - 1.0))
    # update_ladder feeds its games count through
    lad = elo.LadderState(base_rollouts=100)
    e = elo.update_ladder(lad, {"score": 1.0, "games": 64, "wins": 64,
                                "losses": 0, "draws": 0}, step=1)
    assert e == pytest.approx(sweep)


def test_ladder_promotes():
    lad = elo.LadderState(base_rollouts=100, promote_score=0.8)
    assert lad.anchor_rollouts == 100
    e1 = elo.update_ladder(lad, {"score": 0.9, "games": 8, "wins": 7,
                                 "losses": 0, "draws": 1}, step=1)
    assert lad.level == 1 and lad.anchor_rollouts == 200
    e2 = elo.update_ladder(lad, {"score": 0.5, "games": 8, "wins": 4,
                                 "losses": 4, "draws": 0}, step=2)
    assert lad.level == 1  # no promotion on 0.5
    assert e2 == pytest.approx(lad.anchor_elo)
    assert len(lad.history) == 2
