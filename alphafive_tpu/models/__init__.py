"""Policy-value networks and evaluators (SURVEY.md §1 L3)."""

from alphafive_tpu.models.resnet import PolicyValueNet, init_variables

__all__ = ["PolicyValueNet", "init_variables"]
