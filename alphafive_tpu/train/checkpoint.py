"""Full-state checkpoint/resume via orbax (SURVEY.md §5.3/§5.4).

The reference checkpoints net weights only (`tf.train.Saver`); buffer and
step state are lost on restart. Here the WHOLE training state is captured —
params, optimizer state, batch stats, env states, the replay ring, the PRNG
key, iteration counter, and the Elo ladder — so a resume is bit-reproducible
(SURVEY.md §5.4). Config is serialized alongside every checkpoint.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from alphafive_tpu.config import RunConfig
from alphafive_tpu.parallel.mesh import TrainCarry
from alphafive_tpu.utils.elo import LadderState


def make_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


def save(mgr: ocp.CheckpointManager, iteration: int, carry: TrainCarry,
         key: jax.Array, cfg: RunConfig, ladder: LadderState,
         extra: Optional[Dict[str, Any]] = None) -> None:
    meta = {
        "config": cfg.to_json(),
        "ladder": json.dumps(dataclasses.asdict(ladder)),
        "iteration": iteration,
        **(extra or {}),
    }
    import numpy as np
    state = {
        "carry": carry,
        # host numpy, not a device array: a single-device jax.Array here is
        # host-local and orbax refuses to serialize it in multi-process
        # runs (caught by tests/test_distributed.py's real 2-process
        # cluster); numpy is treated as replicated and written by the
        # primary
        "key": np.asarray(jax.random.key_data(key)),
    }
    mgr.save(iteration, args=ocp.args.Composite(
        state=ocp.args.StandardSave(state),
        meta=ocp.args.JsonSave(meta),
    ))
    mgr.wait_until_finished()


def _ladder_from_dict(lad: Dict[str, Any]) -> LadderState:
    """Rebuild LadderState tolerating fields added after a save (e.g.
    max_rollouts — ADVICE.md round-1: dropping it silently reverted a
    customized anchor cap on resume)."""
    defaults = LadderState()
    return LadderState(
        level=lad["level"],
        base_rollouts=lad["base_rollouts"],
        promote_score=lad["promote_score"],
        max_rollouts=lad.get("max_rollouts", defaults.max_rollouts),
        history=lad["history"])


def read_meta(mgr: ocp.CheckpointManager,
              iteration: Optional[int] = None):
    """(iteration, RunConfig, LadderState) of a checkpoint's metadata."""
    step = iteration if iteration is not None else mgr.latest_step()
    assert step is not None, "no checkpoint found"
    out = mgr.restore(step, args=ocp.args.Composite(
        meta=ocp.args.JsonRestore()))
    meta = out["meta"]
    cfg = RunConfig.from_json(meta["config"])
    ladder = _ladder_from_dict(json.loads(meta["ladder"]))
    return int(meta["iteration"]), cfg, ladder


def restore_train_state(mgr: ocp.CheckpointManager,
                        iteration: Optional[int] = None):
    """Model-only restore that works from ANY preset: rebuilds the carry
    from the checkpoint's own saved config (env counts, buffer sizes and
    optimizer shapes must match what was saved, not the caller's preset),
    then returns (train_state, saved_cfg)."""
    import jax as _jax

    from alphafive_tpu import parallel

    step, cfg, _ = read_meta(mgr, iteration)
    mesh = parallel.make_mesh(1)
    carry = parallel.init_carry(cfg, _jax.random.key(0), mesh)
    _, carry, _, _, _ = restore(mgr, carry, step)
    return carry.train_state, cfg


# --- lightweight model export (the distributable "pretrained model") ----
#
# The reference ships a ready-to-play checkpoint in-repo (SURVEY.md §2
# "Pretrained model"). Full training checkpoints embed env/replay state
# whose shapes depend on the training preset, so the bundled artifact is
# params-only: <dir>/model.msgpack + <dir>/config.json.

def export_model(directory: str, params, batch_stats, cfg: RunConfig,
                 extra: Optional[Dict[str, Any]] = None) -> None:
    from flax import serialization

    os.makedirs(directory, exist_ok=True)
    payload = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    with open(os.path.join(directory, "model.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(payload))
    meta = {"config": json.loads(cfg.to_json()), **(extra or {})}
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_model(directory: str):
    """(params, batch_stats, RunConfig) from an export_model directory."""
    from flax import serialization

    from alphafive_tpu.models.resnet import init_variables

    with open(os.path.join(directory, "config.json")) as f:
        meta = json.load(f)
    cfg = RunConfig.from_json(json.dumps(meta["config"]))
    variables = init_variables(cfg.env, cfg.net, jax.random.key(0))
    target = {"params": variables["params"],
              "batch_stats": variables.get("batch_stats", {})}
    with open(os.path.join(directory, "model.msgpack"), "rb") as f:
        payload = serialization.from_bytes(target, f.read())
    return payload["params"], payload["batch_stats"], cfg


def restore(mgr: ocp.CheckpointManager, carry_like: TrainCarry,
            iteration: Optional[int] = None
            ) -> Tuple[int, TrainCarry, jax.Array, RunConfig, LadderState]:
    import numpy as np
    step = iteration if iteration is not None else mgr.latest_step()
    assert step is not None, "no checkpoint found"
    key0 = np.asarray(jax.random.key_data(jax.random.key(0)))
    try:
        out = mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(
                {"carry": carry_like, "key": key0}),
            meta=ocp.args.JsonRestore(),
        ))
        carry = out["state"]["carry"]
    except Exception:
        # Pre-round-3 checkpoints lack TrainCarry.pending/has_pending
        # (the z-lookahead staging slot), so a full-structure restore hits
        # an orbax structure mismatch (ADVICE.md round 3). Restore the
        # old-format subset and default the new fields to their init-carry
        # values: an empty staging slot whose first write stays gated off.
        out = mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore({
                "carry": {"train_state": carry_like.train_state,
                          "env_state": carry_like.env_state,
                          "buffer": carry_like.buffer},
                "key": key0}),
            meta=ocp.args.JsonRestore(),
        ))
        c = out["state"]["carry"]
        carry = TrainCarry(
            train_state=c["train_state"], env_state=c["env_state"],
            buffer=c["buffer"], pending=carry_like.pending,
            has_pending=carry_like.has_pending)
    meta = out["meta"]
    cfg = RunConfig.from_json(meta["config"])
    ladder = _ladder_from_dict(json.loads(meta["ladder"]))
    key = jax.random.wrap_key_data(out["state"]["key"])
    return int(meta["iteration"]), carry, key, cfg, ladder
