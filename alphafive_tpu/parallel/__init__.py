"""Device-mesh parallelism: sharded actor-learner SPMD program (SURVEY.md §5.8)."""

from alphafive_tpu.parallel.mesh import (make_mesh, make_train_iteration,
                                         TrainCarry, init_carry)
from alphafive_tpu.parallel import distributed

__all__ = ["make_mesh", "make_train_iteration", "TrainCarry", "init_carry",
           "distributed"]
