"""Multi-host initialization and helpers (SURVEY.md §5.8, BASELINE.json:10).

The reference has no distributed execution (SURVEY.md §2 parallelism table).
The TPU-native multi-host story is exactly the single-host one: the SPMD
iteration in parallel/mesh.py is already written against a global mesh, so
scaling to a v5p-16 pod slice is

    1. every host runs the same program,
    2. ``jax.distributed.initialize`` wires the processes together
       (auto-detected coordinator on TPU pods; explicit flags elsewhere),
    3. the mesh is built over ``jax.devices()`` (now the GLOBAL device list),
    4. host-local data (nothing in this framework — envs live on device)
       needs no resharding; checkpoints and logging are process-0-only.

The learner's gradient ``pmean`` compiles to an all-reduce over ICI within
the slice. The driver validates the sharded program on a virtual 8-device
CPU mesh (``__graft_entry__.dryrun_multichip``); true multi-host runs are
validated by the scaling benchmark itself (SURVEY.md §4 "Distributed
without a cluster").
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up JAX's distributed runtime. No-op for single-process runs.

    On TPU pods all three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters or tests.
    """
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def barrier(name: str = "alphafive") -> None:
    """Block until every process reaches this point (multi-host sync)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def scale_for_processes(n: int) -> int:
    """Per-process share of a global count n (must divide evenly)."""
    p = jax.process_count()
    assert n % p == 0, f"global count {n} not divisible by {p} processes"
    return n // p
