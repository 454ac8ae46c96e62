"""CLI surface tests: override parsing and the play-mode plumbing.

The heavyweight subcommands (train/bench) are covered by the integration
tests; here we pin the config-override grammar and the human-play console
loop (SURVEY.md §3.4) with scripted stdin.
"""

import builtins
import io

import pytest

from alphafive_tpu import cli
from alphafive_tpu.config import get_preset


def test_apply_overrides_types():
    cfg = get_preset("tiny_test")
    cfg = cli._apply_overrides(cfg, [
        "mcts.num_simulations=8",
        "net.use_pallas=true",
        "train.learning_rate=0.5",
        "env.rules=renju_lite",
    ])
    assert cfg.mcts.num_simulations == 8
    assert cfg.net.use_pallas is True
    assert cfg.train.learning_rate == 0.5
    assert cfg.env.rules == "renju_lite"


def test_apply_overrides_rejects_garbage():
    cfg = get_preset("tiny_test")
    with pytest.raises(AssertionError):
        cli._apply_overrides(cfg, ["mcts.num_simulations"])
    with pytest.raises(AttributeError):
        cli._apply_overrides(cfg, ["mcts.nope=1"])
    # a typo'd value for an Optional numeric field must raise loudly, not
    # store the raw string (round-2 advisor finding)
    with pytest.raises(ValueError, match="not numeric"):
        cli._apply_overrides(cfg, ["mcts.branch_cap=12x"])
    # none/null still clears Optional fields
    assert cli._apply_overrides(
        cfg, ["mcts.branch_cap=none"]).mcts.branch_cap is None
    # ...even Optional fields whose current value is set (declared-type
    # check, not value check)
    import dataclasses
    cfg_set = dataclasses.replace(
        cfg, mcts=dataclasses.replace(cfg.mcts, branch_cap=32))
    assert cli._apply_overrides(
        cfg_set, ["mcts.branch_cap=null"]).mcts.branch_cap is None
    # but a REQUIRED field must refuse none/null loudly instead of
    # planting a None that detonates deep in search setup (round-3
    # advisor finding)
    with pytest.raises(ValueError, match="Optional"):
        cli._apply_overrides(cfg, ["mcts.num_simulations=none"])


def test_play_pure_opponent_scripted(monkeypatch, capsys):
    """Console play vs the net-free rollout MCTS, a few scripted moves.

    Feeding EOF mid-game exercises the clean-exit path; a full game would
    take minutes on CPU.
    """
    moves = iter(["2 2", "1 1"])

    def fake_input(prompt=""):
        try:
            return next(moves)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr(builtins, "input", fake_input)
    rc = cli.main([
        "play", "--preset", "tiny_test", "--platform", "cpu",
        "--opponent", "pure", "--sims", "8",
    ])
    out = capsys.readouterr().out
    assert rc == 0 or rc is None
    assert "AI plays" in out or "bye" in out


def test_all_presets_construct_and_json_roundtrip():
    """Every named preset (the BASELINE configs + training recipes +
    lowsim_15x15) builds, serializes to JSON (the form embedded in every
    checkpoint), and round-trips losslessly; gumbel presets satisfy the
    search's branch_cap=None requirement (mcts/gumbel.py)."""
    from alphafive_tpu.config import PRESETS, RunConfig

    for name, make in PRESETS.items():
        cfg = make()
        assert cfg.name == name
        back = RunConfig.from_json(cfg.to_json())
        assert back == cfg, name
        if cfg.mcts.root_selection == "gumbel":
            assert cfg.mcts.branch_cap is None, name


def test_load_model_accepts_export_dir(tmp_path):
    """--workdir pointing at a params-only export dir (export_model)
    loads the model instead of warning and falling back to a fresh net."""
    import dataclasses

    import jax
    import numpy as np

    from alphafive_tpu import cli
    from alphafive_tpu.config import get_preset
    from alphafive_tpu.train import checkpoint as ckpt, learner

    cfg = get_preset("tiny_test")
    cfg = dataclasses.replace(cfg, mesh=dataclasses.replace(cfg.mesh, data=1))
    ts = learner.init_train_state(cfg.env, cfg.net, cfg.train,
                                  jax.random.key(9))
    d = str(tmp_path / "export")
    ckpt.export_model(d, ts.params, ts.batch_stats, cfg)
    params, batch_stats, net_cfg = cli._load_model(cfg, d)
    assert net_cfg == cfg.net
    np.testing.assert_array_equal(
        np.asarray(params["stem_conv"]["kernel"]),
        np.asarray(ts.params["stem_conv"]["kernel"]))


def test_hbm_footprint_guard():
    """The pod_v5p16 preset collapsed onto one device must be refused
    (its 8,192-env program crashed the axon worker three rounds running,
    docs/NORTH_STAR.md §5), while every config measured to run on one
    chip must pass — including the per-chip pod SHARD methodology the
    guard's message recommends."""
    import dataclasses
    from alphafive_tpu.config import PRESETS
    from alphafive_tpu.utils.memory import budget_error

    pod = get_preset("pod_v5p16")
    assert budget_error(pod, 1) is not None
    assert "per-chip shard" in budget_error(pod, 1)
    assert budget_error(pod, 8) is None  # intended layout fits
    # the recommended single-chip shard passes
    shard = dataclasses.replace(
        pod, mesh=dataclasses.replace(pod.mesh, data=1),
        train=dataclasses.replace(pod.train, num_envs=1024),
        replay=dataclasses.replace(pod.replay, batch_size=512))
    assert budget_error(shard, 1) is None
    # everything known to run on the one v5e chip passes on one device
    for name in ("chip_15x15", "host_15x15", "renju_19x19",
                 "lowsim_15x15", "train_15x15", "train_19x19"):
        assert budget_error(PRESETS[name](), 1) is None, name


def test_pretrained_dir_prefers_strength_ranked_variant():
    """The per-board bundled-model resolution prefers a strength-ranked
    variant dir when one ships: 15×15 must resolve to the
    `pretrained/15x15_lowsim` bundle (beats the classic bundle at every
    neutral budget — its README), while boards without a variant resolve
    to their plain dir and unshipped boards to None."""
    import dataclasses
    import os

    from alphafive_tpu import cli
    from alphafive_tpu.config import get_preset

    cfg15 = get_preset("train_15x15")
    d = cli._pretrained_dir(cfg15)
    assert d is not None and os.path.basename(d) == "15x15_lowsim"

    cfg19 = get_preset("train_19x19")
    d19 = cli._pretrained_dir(cfg19)
    assert d19 is not None and os.path.basename(d19) == "19x19_10b"

    cfg9 = get_preset("train_9x9")
    d9 = cli._pretrained_dir(cfg9)
    assert d9 is not None and os.path.basename(d9) == "9x9"

    cfg7 = dataclasses.replace(
        cfg9, env=dataclasses.replace(cfg9.env, board_size=7))
    assert cli._pretrained_dir(cfg7) is None


def test_config_from_json_drops_removed_fields():
    """Configs live inside every checkpoint/export, so deserialization
    must tolerate fields that later rounds REMOVED from the dataclasses
    (e.g. train.eval_rollouts): loading an old artifact must not raise."""
    import json

    from alphafive_tpu.config import RunConfig, get_preset

    cfg = get_preset("tiny_test")
    d = json.loads(cfg.to_json())
    d["train"]["eval_rollouts"] = 8        # removed round 5
    d["mcts"]["some_future_or_past_knob"] = 1
    back = RunConfig.from_json(json.dumps(d))
    assert back == cfg
