"""On-device replay ring (SURVEY.md §1 L4)."""

from alphafive_tpu.replay.buffer import ReplayBuffer, init, write, sample

__all__ = ["ReplayBuffer", "init", "write", "sample"]
