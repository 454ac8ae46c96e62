"""Pallas TPU kernel for batched MCTS PUCT descent over a packed tree.

Motivation (measured on v5e, 15×15/400 sims/256 envs): the XLA formulation
of selection — a vmapped per-env while_loop of row gathers — makes XLA
relayout every tree array once per simulation (gathers want env-minor,
scatters produce standard layout), and ~50% of device time goes to those
copies. This kernel keeps the tree in HBM untouched and pointer-chases each
env's descent with one row DMA per (env, depth) step into VMEM — the only
HBM traffic is the ~4.5 KB of rows a descent actually reads.

Packed tree layout (one array so each descent step is ONE DMA per env):

    packed f32[E, NN, 8, A_pad]   sections along axis 2:
      0: N(node, a)   edge visit counts
      1: W(node, a)   edge total value
      2: P(node, a)   prior, sign-masked (illegal cells store -1)
      3: child(node, a) as float (-1 = unexpanded; exact for NN < 2^24)
      4: meta — slot 0: node terminal flag (1.0/0.0), rest zero
      5-7: unused (pad the section axis to the 8-sublane tile)

A_pad rounds the action count up to a multiple of 128 (TPU lane width).

The kernel runs as a single program (grid=()): per descent step it issues
one row DMA per env, waits, and computes PUCT + argmax vectorized over
[E, A]. Selection semantics are bit-identical to mcts/search._select_one
(same op order; ties by lowest action index) — tests/test_pallas_select.py
asserts equality in interpret mode, and the oracle-parity suite covers the
full search.

Measured trade-off (v5e): the kernel is DMA-ISSUE-bound — the serial
per-env issue loop costs ~1µs/env/descent-step — while the XLA path is
relayout-BANDWIDTH-bound (~1 ms per simulation at 256 envs/400 sims). At
256 envs/64 sims the XLA path wins 3.7× (177k vs 48k sims/s); the kernel
regime is few envs × deep/large trees (issue count scales with E·depth,
relayout with E·NN·A). Kept as the opt-in ``select_impl="pallas"`` backend;
"xla" is the default.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed-section indices
SEC_N, SEC_W, SEC_P, SEC_CHILD, SEC_META = 0, 1, 2, 3, 4
# 3 spare sections pad the section axis to 8 — DMA slices must be
# sublane-tile (8) aligned on TPU
NUM_SEC = 8


def pad_actions(a: int) -> int:
    return ((a + 127) // 128) * 128


def _select_kernel(a: int, depth_limit: int, c_puct: float,
                   forced_k: float,
                   packed_ref,      # HBM [E, NN, 5, A_pad]
                   leaf_ref,        # VMEM [1, E] i32 out
                   act_ref,         # VMEM [1, E] i32 out
                   depth_ref,       # VMEM [1, E] i32 out
                   pn_ref,          # VMEM [D, E] i32 out (env-minor: path
                   pa_ref,          # VMEM [D, E] i32 out  rows are written
                                    #   at dynamic SUBLANE index — dynamic
                                    #   lane stores are not supported)
                   rows,            # VMEM scratch [E, 8, A_pad] f32
                   curv,            # VMEM scratch [1, E] i32
                   curs,            # SMEM scratch [1, E] i32
                   sems,            # DMA sems [E]
                   sem_cur):        # DMA sem for curv→curs
    e_envs = rows.shape[0]
    a_pad = rows.shape[2]
    d = depth_limit

    # DMA addresses need scalars: vectors are staged VMEM→SMEM, and the
    # issue/wait loops read per-env scalars from SMEM (Mosaic cannot read
    # a dynamic lane of a VMEM vector directly).
    def issue(e, _):
        # unconditional fetch: stopped lanes re-fetch their leaf row (their
        # cur stays valid), which is cheaper than predicating the copy
        idx = curs[0, e]
        pltpu.make_async_copy(
            packed_ref.at[e, idx], rows.at[e], sems.at[e]).start()
        return _

    def wait(e, _):
        idx = curs[0, e]
        pltpu.make_async_copy(
            packed_ref.at[e, idx], rows.at[e], sems.at[e]).wait()
        return _

    def stage_to_smem(cur_vec):
        curv[0, :] = cur_vec
        cp = pltpu.make_async_copy(curv, curs, sem_cur)
        cp.start()
        cp.wait()

    # prologue: every lane starts at the root (node 0)
    stage_to_smem(jnp.zeros((e_envs,), jnp.int32))
    pn_ref[...] = jnp.zeros_like(pn_ref)
    pa_ref[...] = jnp.zeros_like(pa_ref)
    jax.lax.fori_loop(0, e_envs, issue, None)
    jax.lax.fori_loop(0, e_envs, wait, None)

    lane = jax.lax.broadcasted_iota(jnp.int32, (e_envs, a_pad), 1)

    def body(carry):
        it, cur, act, stop_i, depth = carry
        stop = stop_i > 0  # bool vectors can't be loop carries on Mosaic
        # rows match `cur` for active lanes (stale rows are masked by stop)
        n = rows[:, SEC_N, :]
        w = rows[:, SEC_W, :]
        p_signed = rows[:, SEC_P, :]
        child_f = rows[:, SEC_CHILD, :]
        done_cur = rows[:, SEC_META, 0] > 0.5

        revisit = done_cur | (depth >= d)
        # pad lanes (>= num_actions) carry p == 0 and must stay illegal
        legal = (p_signed >= 0) & (lane < a)
        pp = jnp.maximum(p_signed, 0.0)
        q = jnp.where(n > 0, w / jnp.maximum(n, 1.0), 0.0)
        # pad lanes have n == 0, so the plain row sum matches the oracle
        ns = 1.0 + jnp.sum(n, axis=-1, keepdims=True)
        u = c_puct * pp * jnp.sqrt(ns) / (1.0 + n)
        score = jnp.where(legal, q + u, -jnp.inf)
        # forced playouts at the root (KataGo; see mcts/search.py)
        forced = (legal & (depth[:, None] == 0) & (n > 0)
                  & (n * n < forced_k * pp * (ns - 1.0)))
        score = jnp.where(forced, jnp.inf, score)
        amax = jnp.argmax(score, axis=-1).astype(jnp.int32)
        onehot = lane == amax[:, None]
        ch = jnp.sum(jnp.where(onehot, child_f, 0.0),
                     axis=-1).astype(jnp.int32)

        live = ~stop
        newly_stop = live & (revisit | (ch < 0))
        rec = live & ~revisit
        # iteration index == per-env depth while a lane is live, so the
        # path buffers are written row-by-row
        slot = jnp.minimum(it, d - 1)
        pn_ref[slot, :] = jnp.where(rec, cur, 0)
        pa_ref[slot, :] = jnp.where(rec, amax, 0)
        depth = depth + rec.astype(jnp.int32)
        nxt = jnp.where(stop | newly_stop | (ch < 0), cur, ch)
        act = jnp.where(stop, act, jnp.where(revisit, -1, amax))
        stop = stop | newly_stop

        # fetch the next rows (stopped lanes harmlessly re-fetch their
        # leaf row — cheaper than predicating the copies)
        stage_to_smem(nxt)
        jax.lax.fori_loop(0, e_envs, issue, None)
        jax.lax.fori_loop(0, e_envs, wait, None)
        return it + 1, nxt, act, stop.astype(jnp.int32), depth

    def cond(carry):
        it, _, _, stop_i, _ = carry
        return (it < d) & (jnp.min(stop_i) < 1)

    init = (jnp.int32(0),
            jnp.zeros((e_envs,), jnp.int32),
            jnp.full((e_envs,), -1, jnp.int32),
            jnp.zeros((e_envs,), jnp.int32),
            jnp.zeros((e_envs,), jnp.int32))
    _, cur, act, stop_i, depth = jax.lax.while_loop(cond, body, init)
    # lanes that never stopped (it == d exhausted) are depth-capped leaves
    act = jnp.where(stop_i > 0, act, -1)
    leaf_ref[0, :] = cur
    act_ref[0, :] = act
    depth_ref[0, :] = depth


def select_batch(packed: jnp.ndarray, num_actions: int, depth_limit: int,
                 c_puct: float, forced_k: float = 0.0,
                 interpret: bool = False) -> Tuple[jnp.ndarray, ...]:
    """Run the descent kernel.

    packed: f32[E, NN, 5, A_pad]. Returns (leaf[E], act[E], depth[E],
    pn[E, D], pa[E, D]) — same contract as search._select_one vmapped.
    """
    e, nn, sec, a_pad = packed.shape
    assert sec == NUM_SEC
    d = depth_limit
    kernel = functools.partial(_select_kernel, num_actions, d,
                               float(c_puct), float(forced_k))
    leaf, act, depth, pn, pa = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, e), jnp.int32),
            jax.ShapeDtypeStruct((1, e), jnp.int32),
            jax.ShapeDtypeStruct((1, e), jnp.int32),
            jax.ShapeDtypeStruct((d, e), jnp.int32),
            jax.ShapeDtypeStruct((d, e), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((e, NUM_SEC, a_pad), jnp.float32),
            pltpu.VMEM((1, e), jnp.int32),
            pltpu.SMEM((1, e), jnp.int32),
            pltpu.SemaphoreType.DMA((e,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(packed)
    return leaf[0], act[0], depth[0], pn.T, pa.T
