"""Array MCTS vs scalar recursive oracle: bit-equal visit counts on frozen
evaluators (SURVEY.md §4 "Unit (MCTS)"), plus tactical sanity and the
π/temperature helpers.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphafive_tpu.config import EnvConfig, MCTSConfig
from alphafive_tpu.env import vector
from alphafive_tpu.env.scalar import ScalarGomoku
from alphafive_tpu.mcts import reference, search
from alphafive_tpu.models.evaluator import uniform_evaluator


# ---------------------------------------------------------------------------
# A frozen evaluator computable bit-identically in NumPy and XLA:
# integer arithmetic on the board, then one exact float division.
# ---------------------------------------------------------------------------

def _int_value(board_i32, size):
    weights = (np.arange(size * size) % 5 - 2).astype(np.int64)
    s = int(np.sum(board_i32.astype(np.int64) * weights))
    return np.float32((s % 7) - 3) / np.float32(8)


def np_eval(size):
    def evaluate(board, to_play, last):
        del to_play, last
        return (np.zeros(size * size, np.float32),
                _int_value(board.astype(np.int32), size))
    return evaluate


def jax_eval(size):
    weights = jnp.asarray((np.arange(size * size) % 5 - 2).astype(np.int32))

    def evaluate(board, to_play, last, key):
        del to_play, last, key
        s = jnp.sum(board.astype(jnp.int32) * weights[None, :], axis=-1)
        v = ((s % 7) - 3).astype(jnp.float32) / jnp.float32(8)
        return jnp.zeros((board.shape[0], size * size), jnp.float32), v
    return evaluate


def random_midgame(size, n_in_row, plies, seed):
    for s in range(seed, seed + 50):  # retry seeds that end early
        g = ScalarGomoku(size, n_in_row)
        rng = np.random.default_rng(s)
        for _ in range(plies):
            la = g.legal_actions()
            g.step(int(la[rng.integers(len(la))]))
            if g.done:
                break
        if not g.done:
            return g
    raise AssertionError("no live midgame position found")


def to_env_state(games):
    size = games[0].size
    return vector.EnvState(
        board=jnp.asarray(np.stack([g.board.reshape(-1) for g in games])),
        to_play=jnp.asarray(np.array([g.to_play for g in games], np.int8)),
        last_move=jnp.asarray(np.array([g.last_move for g in games],
                                       np.int32)),
        move_count=jnp.asarray(np.array([g.move_count for g in games],
                                        np.int32)),
        done=jnp.zeros((len(games),), bool),
        winner=jnp.zeros((len(games),), jnp.int8),
    )


@pytest.mark.parametrize("size,n_in_row,sims,plies", [
    (5, 4, 60, 0),    # empty board
    (5, 4, 60, 8),    # midgame
    (5, 4, 120, 18),  # near-endgame: terminal leaves get revisited
    (9, 5, 50, 10),
])
def test_visit_count_parity(size, n_in_row, sims, plies):
    env_cfg = EnvConfig(board_size=size, n_in_row=n_in_row)
    mcts_cfg = MCTSConfig(num_simulations=sims, c_puct=5.0)
    games = [random_midgame(size, n_in_row, plies, seed)
             for seed in (1, 2, 3, 4)]
    state = to_env_state(games)

    run = jax.jit(functools.partial(
        search.run_mcts, env_cfg, mcts_cfg, jax_eval(size),
        add_noise=False))
    res = run(state, jax.random.key(0))
    visits = np.asarray(res.visits)
    root_vals = np.asarray(res.root_value)

    for i, g in enumerate(games):
        ref_n, ref_v = reference.run_mcts_reference(
            g, np_eval(size), sims, c_puct=5.0, root_noise=None)
        np.testing.assert_array_equal(visits[i], ref_n, err_msg=f"env {i}")
        np.testing.assert_allclose(root_vals[i], ref_v, rtol=1e-5)


def test_win_in_one_found():
    # black: 3 in a row open at both ends on 5x5 (n=4); 44 must dominate
    env_cfg = EnvConfig(board_size=5, n_in_row=4)
    mcts_cfg = MCTSConfig(num_simulations=100)
    g = ScalarGomoku(5, 4)
    for m in [6, 0, 7, 1, 8]:  # black 6,7,8 (row 1); white 0,1
        g.step(m)
    g.step(2)  # white elsewhere; black to move, 5 or 9 completes 4-in-row
    state = to_env_state([g])
    run = jax.jit(functools.partial(
        search.run_mcts, env_cfg, mcts_cfg, uniform_evaluator(env_cfg),
        add_noise=False))
    res = run(state, jax.random.key(1))
    v = np.asarray(res.visits)[0]
    winning = {5, 9}
    assert int(np.argmax(v)) in winning, v.reshape(5, 5)
    assert v[list(winning)].sum() > 0.5 * v.sum()
    assert float(res.root_value[0]) >= 0.4  # root should look winning


def test_dirichlet_noise_legal_only():
    env_cfg = EnvConfig(board_size=5, n_in_row=4)
    legal = jnp.asarray(np.array([[True] * 20 + [False] * 5]))
    noise = search.dirichlet_noise(jax.random.key(0), 0.3, legal)
    n = np.asarray(noise)[0]
    assert abs(n.sum() - 1) < 1e-5
    assert (n[20:] == 0).all() and (n[:20] > 0).all()


def test_pi_from_visits_temperature():
    visits = jnp.asarray([[8.0, 2.0, 0.0, 0.0]])
    pi1 = search.pi_from_visits(visits, jnp.array([1.0]),
                                jnp.array([False]))
    np.testing.assert_allclose(np.asarray(pi1)[0], [0.8, 0.2, 0, 0],
                               atol=1e-6)
    pig = search.pi_from_visits(visits, jnp.array([1.0]), jnp.array([True]))
    np.testing.assert_array_equal(np.asarray(pig)[0], [1, 0, 0, 0])
    # low temperature sharpens
    pis = search.pi_from_visits(visits, jnp.array([0.25]),
                                jnp.array([False]))
    assert float(pis[0, 0]) > 0.99


def test_sample_actions_respects_support():
    pi = jnp.asarray(np.tile(np.array([[0.0, 0.0, 1.0, 0.0]]), (64, 1)))
    acts = search.sample_actions(jax.random.key(0), pi)
    assert (np.asarray(acts) == 2).all()


@pytest.mark.parametrize("lb", [2, 4, 8])
def test_leaf_batch_budget_and_sanity(lb):
    """Leaf-parallel search spends exactly the simulation budget, visits
    only legal moves, and still finds a forced win (VERDICT round-1 #1).

    leaf_batch=1 equals sequential search by construction (the virtual
    visit is the real visit placed early); test_visit_count_parity pins
    that against the recursive oracle. Here we pin the lb>1 semantics."""
    env_cfg = EnvConfig(board_size=5, n_in_row=4)
    mcts_cfg = MCTSConfig(num_simulations=96, leaf_batch=lb)
    g = ScalarGomoku(5, 4)
    for m in [6, 0, 7, 1, 8, 2]:  # black 6,7,8; white 0,1,2; black to move
        g.step(m)
    live = random_midgame(5, 4, 4, seed=9)
    state = to_env_state([g, live])
    run = jax.jit(functools.partial(
        search.run_mcts, env_cfg, mcts_cfg, uniform_evaluator(env_cfg),
        add_noise=False))
    res = run(state, jax.random.key(3))
    v = np.asarray(res.visits)
    # budget: every simulation lands one root visit (roots are not terminal)
    np.testing.assert_array_equal(v.sum(-1), [96, 96])
    # legality: no visits on occupied cells
    occ = np.asarray(state.board) != 0
    assert (v[occ] == 0).all()
    # tactics: the win-in-one (5 or 9) dominates in env 0
    assert int(np.argmax(v[0])) in {5, 9}, v[0].reshape(5, 5)
    assert float(res.root_value[0]) >= 0.4


def test_leaf_batch_rounds_to_divisor():
    """A runtime budget not divisible by leaf_batch (e.g. PCR small
    searches) rounds the batch down to a divisor instead of crashing."""
    env_cfg = EnvConfig(board_size=5, n_in_row=4)
    mcts_cfg = MCTSConfig(num_simulations=96, leaf_batch=8)
    state = to_env_state([random_midgame(5, 4, 2, seed=5)])
    run = jax.jit(functools.partial(
        search.run_mcts, env_cfg, mcts_cfg, uniform_evaluator(env_cfg),
        num_simulations=50, add_noise=False))  # 50 % 8 != 0 -> lb=5
    res = run(state, jax.random.key(4))
    assert float(np.asarray(res.visits).sum()) == 50


@pytest.mark.parametrize("lb", [1, 4])
def test_branch_cap_full_width_matches_exact(lb):
    """branch_cap == num_actions is the exact search in slot clothing:
    with an evaluator giving DISTINCT priors (no argmax ties — slot order
    differs from action order), visit counts must match the uncapped
    search exactly, for both sequential and leaf-parallel passes."""
    import dataclasses
    from alphafive_tpu.env import vector as _v
    from tests.test_pallas_select import frozen_net_evaluator

    env_cfg = EnvConfig(board_size=7, n_in_row=4)
    base = MCTSConfig(num_simulations=64, leaf_batch=lb)
    capped = dataclasses.replace(base, branch_cap=env_cfg.num_actions)
    ev = frozen_net_evaluator(env_cfg, jax.random.key(7))
    state = _v.init(env_cfg, 4)
    key = jax.random.key(13)
    for _ in range(5):
        key, k = jax.random.split(key)
        legal = state.board == 0
        acts = jax.random.categorical(
            k, jnp.where(legal, 0.0, -jnp.inf), axis=-1).astype(jnp.int32)
        state = _v.step(env_cfg, state, acts)

    ra = jax.jit(functools.partial(
        search.run_mcts, env_cfg, base, ev, add_noise=False))(state, key)
    rb = jax.jit(functools.partial(
        search.run_mcts, env_cfg, capped, ev, add_noise=False))(state, key)
    np.testing.assert_array_equal(np.asarray(ra.visits),
                                  np.asarray(rb.visits))
    np.testing.assert_allclose(np.asarray(ra.root_value),
                               np.asarray(rb.root_value), rtol=1e-5)


def test_deep_forced_line_virtual_visits():
    """Descents deeper than 16 plies must keep exact full-path
    virtual-visit semantics (round-2 verdict weak #3: the old
    implementation windowed the lane-divergence comparison to the first
    16 path slots, silently wasting lane budget on deeper forced lines).

    The evaluator is chain-then-uniform: while the position holds fewer
    than K=20 stones it puts almost all prior on the lowest-index empty
    cell (a forced line all lanes follow in lockstep); at >= K stones
    priors go uniform, so the DIVERGENCE POINT sits at tree depth 20 —
    past the old window. There, lanes must see each other's virtual
    visits to spread across children; windowed lanes see nothing,
    collapse onto one child, dedup, and produce different visit counts.
    The capped search at full width must match the exact search (which
    scatters virtual visits at EVERY depth) bit-for-bit — verified to
    FAIL against a window-limited virt_row during development."""
    env_cfg = EnvConfig(board_size=9, n_in_row=5)
    a = env_cfg.num_actions
    k_chain = 20

    # board-dependent leaf values make the depth-20 collapse observable
    # at the root: collapsed lanes evaluate ONE leaf (its value counted
    # 4x in root_value), spread lanes evaluate four different leaves
    weights = jnp.asarray((np.arange(a) % 5 - 2).astype(np.int32))

    def chain_then_uniform_eval(board, to_play, last, key):
        del to_play, last, key
        legal = board == 0
        count = jnp.sum(board != 0, axis=-1)
        first_legal = jnp.argmax(legal, axis=-1)
        peaked = jnp.where(
            jnp.arange(a)[None, :] == first_legal[:, None], 30.0, 0.0)
        logits = jnp.where((count < k_chain)[:, None], peaked, 0.0)
        s = jnp.sum(board.astype(jnp.int32) * weights[None, :], axis=-1)
        value = ((s % 7) - 3).astype(jnp.float32) / 8.0
        return logits, value

    base = MCTSConfig(num_simulations=128, leaf_batch=4, max_depth=64)
    import dataclasses
    capped = dataclasses.replace(base, branch_cap=a)
    state = vector.init(env_cfg, 2)
    key = jax.random.key(5)
    ra = jax.jit(functools.partial(
        search.run_mcts, env_cfg, base, chain_then_uniform_eval,
        add_noise=False))(state, key)
    rb = jax.jit(functools.partial(
        search.run_mcts, env_cfg, capped, chain_then_uniform_eval,
        add_noise=False))(state, key)
    va, vb = np.asarray(ra.visits), np.asarray(rb.visits)
    # the forced line really is deep: the chain move soaks up most of
    # the budget (the line extends ~1 ply per pass => tree depth >= 20)
    assert va[0].max() > 28
    np.testing.assert_array_equal(va, vb)
    # root_value sums every lane's leaf value: a windowed/collapsed lane
    # set double-counts one leaf and this assert catches it
    np.testing.assert_allclose(np.asarray(ra.root_value),
                               np.asarray(rb.root_value), rtol=1e-5)


def test_top_c_keeps_zero_prior_legal_moves():
    """A legal move whose softmax prior underflowed to exactly 0.0 must
    stay selectable (prior >= 0) when slots are free; pads/illegal get -1
    (round-2 review finding: cap must not make legal moves unreachable)."""
    from alphafive_tpu.mcts.search_capped import _top_c

    p_signed = jnp.array([[0.5, 0.0, -1.0, 0.3, -1.0]])
    vals, idx = _top_c(p_signed, 5, jnp.float32)
    v, i = np.asarray(vals)[0], np.asarray(idx)[0]
    assert (v[:3] >= 0).all() and set(i[:3]) == {0, 1, 3}
    assert (v[3:] == -1).all()  # illegal stay pads


def test_branch_cap_small_budget_and_tactics():
    """A small cap spends the full budget on legal moves and still finds
    the forced win (it has the highest prior under the uniform evaluator
    only by visits — use enough sims that PUCT converges)."""
    env_cfg = EnvConfig(board_size=5, n_in_row=4)
    mcts_cfg = MCTSConfig(num_simulations=96, leaf_batch=4, branch_cap=8)
    g = ScalarGomoku(5, 4)
    for m in [6, 0, 7, 1, 8, 2]:
        g.step(m)
    state = to_env_state([g])
    res = jax.jit(functools.partial(
        search.run_mcts, env_cfg, mcts_cfg, uniform_evaluator(env_cfg),
        add_noise=False))(state, jax.random.key(5))
    v = np.asarray(res.visits)[0]
    assert v.sum() == 96
    occ = np.asarray(state.board)[0] != 0
    assert (v[occ] == 0).all()
    assert int(np.argmax(v)) in {5, 9}, v.reshape(5, 5)


def test_packed_int16_capped_close_to_f32():
    """The branch-capped search's PACKED stats (s32 = value<<16 | visits,
    int16 mode) must track the same capped search with exact f32 sums
    closely — same tolerance as the unpacked int16 test."""
    import dataclasses
    from alphafive_tpu.env import vector as _v
    from tests.test_pallas_select import frozen_net_evaluator

    env_cfg = EnvConfig(board_size=7, n_in_row=4)
    base = MCTSConfig(num_simulations=64, leaf_batch=4, branch_cap=16)
    packed = dataclasses.replace(base, value_dtype="int16")
    ev = frozen_net_evaluator(env_cfg, jax.random.key(21))
    state = _v.init(env_cfg, 4)
    key = jax.random.key(22)
    for _ in range(4):
        key, k = jax.random.split(key)
        legal = state.board == 0
        acts = jax.random.categorical(
            k, jnp.where(legal, 0.0, -jnp.inf), axis=-1).astype(jnp.int32)
        state = _v.step(env_cfg, state, acts)

    ra = jax.jit(functools.partial(
        search.run_mcts, env_cfg, base, ev, add_noise=False))(state, key)
    rb = jax.jit(functools.partial(
        search.run_mcts, env_cfg, packed, ev, add_noise=False))(state, key)
    assert float(np.asarray(ra.visits).sum(-1).min()) == 64
    assert float(np.asarray(rb.visits).sum(-1).min()) == 64
    diff = np.abs(np.asarray(ra.visits) - np.asarray(rb.visits)).sum(-1)
    assert (diff <= 10).all(), diff
    np.testing.assert_allclose(np.asarray(ra.root_value),
                               np.asarray(rb.root_value), atol=0.06)


def test_int16_value_sums_close_to_f32():
    """value_dtype="int16" (1/64 fixed-point W) must track the exact search
    closely — NONZERO leaf values, so the scaling paths are exercised (a
    zero-value evaluator made both root_value and W identically 0 and let
    a 64x root_value scaling bug slip through)."""
    import dataclasses
    import functools
    from alphafive_tpu.config import EnvConfig, MCTSConfig
    from alphafive_tpu.env import vector
    from tests.test_pallas_select import frozen_net_evaluator

    env_cfg = EnvConfig(board_size=7, n_in_row=4)
    base = MCTSConfig(num_simulations=60)
    fixed = dataclasses.replace(base, value_dtype="int16")
    ev = frozen_net_evaluator(env_cfg, jax.random.key(2))
    state = vector.init(env_cfg, 4)
    # play a few random stones so values are nonzero and varied
    key = jax.random.key(11)
    for i in range(4):
        key, k = jax.random.split(key)
        legal = state.board == 0
        logits = jnp.where(legal, 0.0, -jnp.inf)
        acts = jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)
        state = vector.step(env_cfg, state, acts)

    ra = jax.jit(functools.partial(
        search.run_mcts, env_cfg, base, ev, add_noise=False))(state, key)
    rb = jax.jit(functools.partial(
        search.run_mcts, env_cfg, fixed, ev, add_noise=False))(state, key)
    assert float(np.abs(np.asarray(ra.root_value)).max()) > 0.01
    # quantized W perturbs at most a few visits; root values track closely
    diff = np.abs(np.asarray(ra.visits) - np.asarray(rb.visits)).sum(-1)
    assert (diff <= 8).all(), diff
    np.testing.assert_allclose(np.asarray(ra.root_value),
                               np.asarray(rb.root_value), atol=0.05)


def test_deferred_backup_bit_identical():
    """backup_interval=2 (deferred backup: odd passes hand their deltas
    to the next pass through the select-loop lookup instead of
    scattering) must be BIT-IDENTICAL to scattering every pass, at the
    full production search config — packed int16 stats, bf16 priors,
    leaf-parallel lanes, a binding branch cap, depth staging — across
    odd/even pass counts and both search phases of a real game prefix."""
    import dataclasses
    from alphafive_tpu.env import vector as _v
    from alphafive_tpu.mcts.search_capped import run_mcts_capped
    from tests.test_pallas_select import frozen_net_evaluator

    env_cfg = EnvConfig(board_size=9)
    ev = frozen_net_evaluator(env_cfg, jax.random.key(3))
    for sims, lb, cap in ((96, 8, 16), (72, 4, 12), (40, 8, 81)):
        base = MCTSConfig(num_simulations=sims, leaf_batch=lb,
                          branch_cap=cap, max_depth=24,
                          prior_dtype="bfloat16", value_dtype="int16")
        deferred = dataclasses.replace(base, backup_interval=2)
        state = _v.init(env_cfg, 4)
        key = jax.random.key(sims)
        for _ in range(6):
            key, k = jax.random.split(key)
            legal = state.board == 0
            acts = jax.random.categorical(
                k, jnp.where(legal, 0.0, -jnp.inf),
                axis=-1).astype(jnp.int32)
            state = _v.step(env_cfg, state, acts)
        ra = jax.jit(functools.partial(
            run_mcts_capped, env_cfg, base, ev, add_noise=False))(state, key)
        rb = jax.jit(functools.partial(
            run_mcts_capped, env_cfg, deferred, ev,
            add_noise=False))(state, key)
        np.testing.assert_array_equal(np.asarray(ra.visits),
                                      np.asarray(rb.visits))
        np.testing.assert_array_equal(np.asarray(ra.root_value),
                                      np.asarray(rb.root_value))
