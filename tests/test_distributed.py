"""Single-process behavior of the multi-host helpers (SURVEY.md §5.8).

True multi-host needs a pod; these pin the 1-process fast paths the
training loop relies on (primary gating, barrier no-op, env splitting).
"""


from alphafive_tpu.parallel import distributed


def test_single_process_defaults():
    assert distributed.is_primary()
    distributed.barrier("test")  # no-op without peers


def test_initialize_noop_for_one_process():
    # must not try to wire a coordinator for a 1-process run
    distributed.initialize(num_processes=1)


def test_scale_for_processes():
    # with a single process every global count is its own local share
    assert distributed.scale_for_processes(8) == 8
    assert distributed.scale_for_processes(7) == 7
