"""Board engines: scalar NumPy oracle + vectorized JAX env (SURVEY.md §1 L1)."""

from alphafive_tpu.env.scalar import ScalarGomoku
from alphafive_tpu.env import vector

__all__ = ["ScalarGomoku", "vector"]
