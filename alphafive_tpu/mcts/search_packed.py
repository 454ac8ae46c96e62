"""MCTS over the packed tree layout driven by the Pallas descent kernel.

Same search semantics as mcts/search.run_mcts (one expansion per
simulation, PUCT with sign-masked priors, sign-alternating backup) but the
per-edge statistics live in ONE packed f32 array [E, NN, 8, A_pad]
(ops/pallas_select.py) and selection runs as a Pallas kernel that DMAs only
the rows a descent actually visits — no tree-sized relayouts per simulation.
Node metadata (boards, players, terminal info) stays in side arrays that the
hot loop never touches row-wise except through scalar-index gathers.

Enabled by ``MCTSConfig.select_impl = "pallas"``; `"xla"` keeps the pure-XLA
search. Both must produce identical visit counts — tests/test_pallas_select
checks kernel-vs-XLA equality (interpret mode on CPU), and the oracle-parity
suite pins the semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from alphafive_tpu.config import EnvConfig, MCTSConfig
from alphafive_tpu.env import vector
from alphafive_tpu.env.vector import EnvState
from alphafive_tpu.mcts.search import (SearchResult, dirichlet_noise,
                                       masked_softmax)
from alphafive_tpu.ops import pallas_select as ps


@struct.dataclass
class PackedTree:
    packed: jnp.ndarray       # f32 [E, NN, 8, A_pad] (ops/pallas_select.py)
    node_board: jnp.ndarray   # int8 [E, NN, A]
    node_done: jnp.ndarray    # bool [E, NN]
    node_winner: jnp.ndarray  # int8 [E, NN]
    node_to_play: jnp.ndarray  # int8 [E, NN]
    node_last: jnp.ndarray    # int32 [E, NN]
    node_count: jnp.ndarray   # int32 [E, NN]


def _tree_init(env_cfg: EnvConfig, e: int, nn: int) -> PackedTree:
    a = env_cfg.num_actions
    a_pad = ps.pad_actions(a)
    packed = jnp.zeros((e, nn, ps.NUM_SEC, a_pad), jnp.float32)
    # unexpanded child pointers are -1
    packed = packed.at[:, :, ps.SEC_CHILD, :].set(-1.0)
    return PackedTree(
        packed=packed,
        node_board=jnp.zeros((e, nn, a), jnp.int8),
        node_done=jnp.zeros((e, nn), bool),
        node_winner=jnp.zeros((e, nn), jnp.int8),
        node_to_play=jnp.ones((e, nn), jnp.int8),
        node_last=jnp.full((e, nn), -1, jnp.int32),
        node_count=jnp.zeros((e, nn), jnp.int32),
    )


def _gather_env(tree: PackedTree, idx: jnp.ndarray) -> EnvState:
    e = jnp.arange(idx.shape[0])
    return EnvState(
        board=tree.node_board[e, idx],
        to_play=tree.node_to_play[e, idx],
        last_move=tree.node_last[e, idx],
        move_count=tree.node_count[e, idx],
        done=tree.node_done[e, idx],
        winner=tree.node_winner[e, idx],
    )


def _signed_priors(p: jnp.ndarray, legal: jnp.ndarray,
                   a_pad: int) -> jnp.ndarray:
    """[E, A] priors → [E, A_pad] sign-masked (illegal/pad = -1)."""
    e, a = p.shape
    out = jnp.full((e, a_pad), -1.0, jnp.float32)
    return out.at[:, :a].set(jnp.where(legal, p, -1.0))


def run_mcts_packed(
    env_cfg: EnvConfig,
    mcts_cfg: MCTSConfig,
    evaluate,
    state: EnvState,
    key: jax.Array,
    *,
    num_simulations: Optional[int] = None,
    add_noise: bool = True,
    interpret: bool = False,
) -> SearchResult:
    """Packed-tree search; same contract as search.run_mcts."""
    sims = int(num_simulations or mcts_cfg.num_simulations)
    e, a = state.board.shape
    nn = sims + 1
    depth_limit = min(nn, mcts_cfg.max_depth or nn)
    a_pad = ps.pad_actions(a)
    c_puct = float(mcts_cfg.c_puct)
    forced_k = float(mcts_cfg.forced_playouts_k) if add_noise else 0.0

    key, knoise, keval = jax.random.split(key, 3)

    tree = _tree_init(env_cfg, e, nn)
    tree = tree.replace(
        node_board=tree.node_board.at[:, 0].set(state.board),
        node_to_play=tree.node_to_play.at[:, 0].set(state.to_play),
        node_last=tree.node_last.at[:, 0].set(state.last_move),
        node_count=tree.node_count.at[:, 0].set(state.move_count),
        node_done=tree.node_done.at[:, 0].set(state.done),
        node_winner=tree.node_winner.at[:, 0].set(state.winner),
    )
    root_logits, _ = evaluate(state.board, state.to_play, state.last_move,
                              keval)
    root_legal = state.board == 0
    root_p = masked_softmax(root_logits, root_legal)
    if add_noise:
        noise = dirichlet_noise(knoise, mcts_cfg.dirichlet_alpha, root_legal)
        eps = jnp.float32(mcts_cfg.dirichlet_eps)
        root_p = (1.0 - eps) * root_p + eps * noise
    packed = tree.packed
    packed = packed.at[:, 0, ps.SEC_P, :].set(
        _signed_priors(root_p, root_legal, a_pad))
    packed = packed.at[:, 0, ps.SEC_META, 0].set(
        state.done.astype(jnp.float32))
    tree = tree.replace(packed=packed)

    earange = jnp.arange(e)

    def sim_body(s, carry):
        tree, key = carry
        key, keval = jax.random.split(key)

        leaf_parent, sel_act, depth, pn, pa = ps.select_batch(
            tree.packed, a, depth_limit, c_puct, forced_k,
            interpret=interpret)

        is_revisit = sel_act < 0
        safe_act = jnp.maximum(sel_act, 0)

        parent_state = _gather_env(tree, leaf_parent)
        stepped = vector.step(env_cfg, parent_state, safe_act)
        mask = is_revisit

        def sel(x, y):
            m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
            return jnp.where(m, x, y)

        leaf_state = jax.tree.map(sel, parent_state, stepped)

        new = jnp.int32(s + 1)
        logits, v = evaluate(leaf_state.board, leaf_state.to_play,
                             leaf_state.last_move, keval)
        leaf_value = jnp.where(
            leaf_state.done,
            (leaf_state.winner * leaf_state.to_play).astype(jnp.float32),
            v.astype(jnp.float32))
        child_legal = stepped.board == 0
        child_p = masked_softmax(logits, child_legal)

        packed = tree.packed
        packed = packed.at[:, new, ps.SEC_P, :].set(
            _signed_priors(child_p, child_legal, a_pad))
        packed = packed.at[:, new, ps.SEC_META, 0].set(
            stepped.done.astype(jnp.float32))
        # link parent -> child only for expanding lanes
        old = packed[earange, leaf_parent, ps.SEC_CHILD, safe_act]
        packed = packed.at[earange, leaf_parent, ps.SEC_CHILD,
                           safe_act].set(
            jnp.where(is_revisit, old, new.astype(jnp.float32)))

        # backup along the recorded edges (see search.py for the math)
        dn = jnp.arange(depth_limit)[None, :]
        on_path = dn < depth[:, None]
        exp_ = (depth[:, None] - dn).astype(jnp.int32)
        sign = jnp.where(exp_ % 2 == 0, 1.0, -1.0)
        vals = jnp.where(on_path, sign * leaf_value[:, None], 0.0)
        incr = on_path.astype(jnp.float32)
        packed = packed.at[earange[:, None], pn, ps.SEC_N, pa].add(incr)
        packed = packed.at[earange[:, None], pn, ps.SEC_W, pa].add(vals)

        tree = tree.replace(
            packed=packed,
            node_board=tree.node_board.at[:, new].set(stepped.board),
            node_to_play=tree.node_to_play.at[:, new].set(stepped.to_play),
            node_last=tree.node_last.at[:, new].set(stepped.last_move),
            node_count=tree.node_count.at[:, new].set(stepped.move_count),
            node_done=tree.node_done.at[:, new].set(stepped.done),
            node_winner=tree.node_winner.at[:, new].set(stepped.winner),
        )
        return tree, key

    tree, _ = jax.lax.fori_loop(0, sims, sim_body, (tree, key))

    visits = tree.packed[:, 0, ps.SEC_N, :a]
    w_root = tree.packed[:, 0, ps.SEC_W, :a]
    n_sum = visits.sum(-1)
    root_value = jnp.where(n_sum > 0, w_root.sum(-1)
                           / jnp.maximum(n_sum, 1.0), 0.0)
    return SearchResult(visits=visits, root_value=root_value,
                        priors=root_p)
