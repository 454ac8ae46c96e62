"""Tree search: batched on-device array MCTS + scalar oracle (SURVEY.md §1 L2)."""

from alphafive_tpu.mcts.search import run_mcts, SearchResult, masked_softmax
from alphafive_tpu.mcts.gumbel import run_gumbel_mcts, GumbelResult
from alphafive_tpu.mcts import reference

__all__ = ["run_mcts", "SearchResult", "masked_softmax", "reference",
           "run_gumbel_mcts", "GumbelResult"]
