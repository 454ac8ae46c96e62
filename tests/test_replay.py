"""Replay ring buffer + symmetry augmentation unit tests (SURVEY.md §4).

The reference's buffer is a host-side deque with pre-augmented tuples
(SURVEY.md §2 "Replay buffer"); ours is an on-device ring with sample-time
augmentation, so the things to test are the ring arithmetic (wrap-around,
fill accounting) and that the dihedral augmentation keeps (board, π,
last_move) consistent with each other.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphafive_tpu.config import EnvConfig, ReplayConfig
from alphafive_tpu.env import vector
from alphafive_tpu.replay import buffer as rb
from alphafive_tpu.utils import symmetry


ENV = EnvConfig(board_size=5, n_in_row=4)


def _entries(m, seed=0):
    rng = np.random.default_rng(seed)
    a = ENV.num_actions
    board = rng.integers(-1, 2, size=(m, a)).astype(np.int8)
    to_play = rng.choice([1, -1], size=(m,)).astype(np.int8)
    last = rng.integers(-1, a, size=(m,)).astype(np.int32)
    pi = rng.random((m, a)).astype(np.float32)
    pi /= pi.sum(-1, keepdims=True)
    z = rng.choice([-1, 0, 1], size=(m,)).astype(np.int8)
    zv = rng.random(m) > 0.3
    return (jnp.asarray(board), jnp.asarray(to_play), jnp.asarray(last),
            jnp.asarray(pi), jnp.asarray(z), jnp.asarray(zv))


def test_write_fill_and_wrap():
    cfg = ReplayConfig(capacity=10, batch_size=4, min_fill=4)
    buf = rb.init(ENV, cfg)
    e = _entries(6)
    buf = rb.write(buf, *e)
    assert int(buf.size) == 6 and int(buf.ptr) == 6
    buf = rb.write(buf, *_entries(6, seed=1))
    assert int(buf.size) == 10  # saturated
    assert int(buf.ptr) == 2    # wrapped
    # the two oldest entries were overwritten by the wrap
    b2 = np.asarray(_entries(6, seed=1)[0])
    np.testing.assert_array_equal(np.asarray(buf.board)[:2], b2[4:])
    np.testing.assert_array_equal(np.asarray(buf.board)[6:], b2[:4])


def test_sample_only_filled_prefix():
    cfg = ReplayConfig(capacity=100, batch_size=16, min_fill=4)
    buf = rb.init(ENV, cfg)
    e = _entries(3)
    # make the filled entries distinctive: z = +1 everywhere
    e = e[:4] + (jnp.ones((3,), jnp.int8), jnp.ones((3,), bool))
    buf = rb.write(buf, *e)
    feats, pi, z, zv, piv = rb.sample(ENV, buf, jax.random.key(0), 64)
    assert feats.shape == (64, 5, 5, 4)
    np.testing.assert_array_equal(np.asarray(z), 1.0)
    np.testing.assert_array_equal(np.asarray(zv), 1.0)


def test_sample_symmetry_consistency():
    """π mass and stone counts are invariant; the transformed last_move
    lands where the transformed board says the last stone is."""
    cfg = ReplayConfig(capacity=50, batch_size=8, min_fill=4)
    buf = rb.init(ENV, cfg)
    # build entries where last_move cell is uniquely marked: board has
    # exactly one +1 stone at last_move, to_play = -1
    a = ENV.num_actions
    m = 10
    board = np.zeros((m, a), np.int8)
    last = np.arange(m, dtype=np.int32)
    board[np.arange(m), last] = 1
    pi = np.tile(np.arange(a, dtype=np.float32)[None], (m, 1))
    pi /= pi.sum(-1, keepdims=True)
    buf = rb.write(buf, jnp.asarray(board),
                   jnp.full((m,), -1, jnp.int8), jnp.asarray(last),
                   jnp.asarray(pi), jnp.zeros((m,), jnp.int8),
                   jnp.ones((m,), bool))
    feats, spi, _, _, _ = rb.sample(ENV, buf, jax.random.key(7), 32)
    feats = np.asarray(feats)
    spi = np.asarray(spi)
    # π is stored bfloat16 in the ring → ~1e-3 tolerance on sums
    np.testing.assert_allclose(spi.sum(-1), 1.0, atol=5e-3)
    # plane 1 = opponent (+1 stones, since to_play=-1) has exactly 1 stone,
    # and it coincides with the last-move plane
    opp = feats[..., 1].reshape(32, -1)
    lastp = feats[..., 2].reshape(32, -1)
    np.testing.assert_array_equal(opp.sum(-1), 1.0)
    np.testing.assert_array_equal(opp, lastp)


@pytest.mark.parametrize("k", range(symmetry.NUM_SYMMETRIES))
def test_symmetry_tables_roundtrip(k):
    size = 7
    perm, inv = symmetry.dihedral_tables(size)
    # inv is the functional inverse of perm
    np.testing.assert_array_equal(perm[k][inv[k]], np.arange(size * size))
    # apply_symmetry agrees with numpy rot/flip on a 2-D field
    field = np.arange(size * size, dtype=np.float32)[None]
    out = np.asarray(symmetry.apply_symmetry(
        size, jnp.asarray([k]), jnp.asarray(field)))[0].reshape(size, size)
    base = field.reshape(size, size)
    expect = np.fliplr(base) if k >= 4 else base
    expect = np.rot90(expect, k % 4)
    np.testing.assert_array_equal(out, expect)


def test_symmetry_index_matches_field():
    """apply_symmetry_index maps a one-hot's argmax exactly like
    apply_symmetry maps the field."""
    size = 6
    a = size * size
    rng = np.random.default_rng(3)
    idx = rng.integers(0, a, size=(16,)).astype(np.int32)
    ks = rng.integers(0, symmetry.NUM_SYMMETRIES, size=(16,))
    onehot = np.zeros((16, a), np.float32)
    onehot[np.arange(16), idx] = 1.0
    f = np.asarray(symmetry.apply_symmetry(
        size, jnp.asarray(ks), jnp.asarray(onehot)))
    mapped = np.asarray(symmetry.apply_symmetry_index(
        size, jnp.asarray(ks), jnp.asarray(idx)))
    np.testing.assert_array_equal(f.argmax(-1), mapped)
    # -1 passes through
    neg = np.asarray(symmetry.apply_symmetry_index(
        size, jnp.asarray(ks[:1]), jnp.asarray([-1], np.int32)))
    assert neg[0] == -1
