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
import numpy as np
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
    state = {
        "carry": carry,
        "key": jax.random.key_data(key),
    }
    mgr.save(iteration, args=ocp.args.Composite(
        state=ocp.args.StandardSave(state),
        meta=ocp.args.JsonSave(meta),
    ))
    mgr.wait_until_finished()


def restore(mgr: ocp.CheckpointManager, carry_like: TrainCarry,
            iteration: Optional[int] = None
            ) -> Tuple[int, TrainCarry, jax.Array, RunConfig, LadderState]:
    step = iteration if iteration is not None else mgr.latest_step()
    assert step is not None, "no checkpoint found"
    target = {
        "carry": carry_like,
        "key": jax.random.key_data(jax.random.key(0)),
    }
    out = mgr.restore(step, args=ocp.args.Composite(
        state=ocp.args.StandardRestore(target),
        meta=ocp.args.JsonRestore(),
    ))
    meta = out["meta"]
    cfg = RunConfig.from_json(meta["config"])
    lad = json.loads(meta["ladder"])
    ladder = LadderState(level=lad["level"],
                         base_rollouts=lad["base_rollouts"],
                         promote_score=lad["promote_score"],
                         history=lad["history"])
    key = jax.random.wrap_key_data(out["state"]["key"])
    return int(meta["iteration"]), out["state"]["carry"], key, cfg, ladder
