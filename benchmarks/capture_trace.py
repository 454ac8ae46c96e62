"""Capture a jax.profiler trace of the self-play hot loop (run on TPU).

Usage: python benchmarks/capture_trace.py [outdir]
Then parse with benchmarks/parse_trace.py.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from alphafive_tpu.config import get_preset
from alphafive_tpu.env import vector
from alphafive_tpu.models.evaluator import net_evaluator
from alphafive_tpu.train import actor, learner


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace"
    cfg = get_preset("chip_15x15")
    key = jax.random.key(0)
    ts = learner.init_train_state(cfg.env, cfg.net, cfg.train, key)
    env_state = vector.init(cfg.env, cfg.train.num_envs)
    evaluate = net_evaluator(cfg.env, cfg.net, ts.params, ts.batch_stats)
    fn = jax.jit(functools.partial(
        actor.selfplay_chunk, cfg.env, cfg.mcts, evaluate, num_plies=2))
    st, traj, _ = fn(env_state, key)
    jax.block_until_ready(traj.pi)
    jax.profiler.start_trace(outdir)
    st, traj, _ = fn(st, key)
    jax.block_until_ready(traj.pi)
    jax.profiler.stop_trace()
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
