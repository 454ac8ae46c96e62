"""Function-preserving model surgery: warm-start a bigger preset from a
trained smaller model.

The reference family ships one pretrained checkpoint per board size and
trains each from scratch (SURVEY.md §2 "Pretrained model"); at 19×19 with a
10-block net (BASELINE cfg 5) a from-scratch run needs days of device time.
This module converts the bundled 15×15 model into an initializer for the
19×19 Renju preset in three orthogonal, individually-tested transforms:

  * ``widen``  — Net2WiderNet (Chen, Goodfellow & Shlens, "Net2Net",
    ICLR'16; PAPERS.md): duplicate trunk channels via one GLOBAL mapping
    (the residual skip-adds force the same channel identity through the
    whole trunk), divide duplicated fan-in in every consumer, duplicate
    BatchNorm params+stats alongside. Function-preserving at noise=0;
    small noise on the duplicated filters breaks gradient symmetry.
  * ``deepen`` — append residual blocks whose second conv kernel is zero:
    relu(x + 0) = x for post-relu x, so each new block is an exact
    identity (in train mode too — BatchNorm of an all-zero activation is
    zero). The zero conv learns first, then gradients flow into conv1
    (the ReZero/Fixup-style zero-init residual trick).
  * ``resize_board`` — the conv trunk is board-size-agnostic; only the two
    FC heads see the board. Their kernels are resized SPATIALLY: the
    policy FC [2·S², S²] is treated as a [S,S,2,S,S] position→action map
    and bilinearly resized (keeping its learned local/diagonal structure
    instead of re-randomizing the policy), the value FC1 [S², H] as H
    spatial maps; both are rescaled by (S_old/S_new)² to compensate the
    grown input area.

``transfer`` composes the three. Rules changes (freestyle → Renju) need no
parameter work — forbidden-move handling lives in the env, not the net.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from alphafive_tpu.config import EnvConfig, NetConfig


def _take_out(kernel: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Duplicate conv output channels (last axis) via mapping g."""
    return jnp.take(kernel, g, axis=-1)


def _take_in(kernel: jnp.ndarray, g: jnp.ndarray,
             count: jnp.ndarray) -> jnp.ndarray:
    """Duplicate conv input channels (axis -2), dividing by the
    replication count so the widened sum equals the original."""
    k = jnp.take(kernel, g, axis=-2)
    return k / count[g].reshape((1,) * (k.ndim - 2) + (-1, 1))


def _take_vec(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(v, g, axis=0)


def widen(variables: Dict[str, Any], new_channels: int, key: jax.Array,
          noise: float = 1e-2) -> Dict[str, Any]:
    """Net2WiderNet channel widening of the trunk (stem + residual blocks
    + head 1×1 convs' input side). Function-preserving when noise=0."""
    params = jax.tree.map(lambda x: x, variables["params"])
    stats = jax.tree.map(lambda x: x, variables["batch_stats"])
    old_c = params["stem_conv"]["kernel"].shape[-1]
    assert new_channels >= old_c, (new_channels, old_c)
    if new_channels == old_c:
        return {"params": params, "batch_stats": stats}

    key, kg = jax.random.split(key)
    extra = jax.random.randint(kg, (new_channels - old_c,), 0, old_c)
    g = jnp.concatenate([jnp.arange(old_c), extra])
    count = jnp.zeros((old_c,), jnp.float32).at[g].add(1.0)

    def noisy(kernel, k):
        """Perturb only the duplicated (j >= old_c) output filters."""
        if noise == 0.0:
            return kernel
        std = jnp.std(kernel) * noise
        eps = jax.random.normal(k, kernel[..., old_c:].shape,
                                kernel.dtype) * std
        return kernel.at[..., old_c:].add(eps)

    def widen_bn(p, s, name):
        p[name] = {"scale": _take_vec(p[name]["scale"], g),
                   "bias": _take_vec(p[name]["bias"], g)}
        s[name] = {"mean": _take_vec(s[name]["mean"], g),
                   "var": _take_vec(s[name]["var"], g)}

    key, k0 = jax.random.split(key)
    params["stem_conv"] = {
        "kernel": noisy(_take_out(params["stem_conv"]["kernel"], g), k0)}
    widen_bn(params, stats, "stem_bn")

    n_blocks = sum(1 for name in params if name.startswith("block"))
    for i in range(n_blocks):
        blk = params[f"block{i}"]
        bst = stats[f"block{i}"]
        key, k1, k2 = jax.random.split(key, 3)
        blk["conv1"] = {"kernel": noisy(
            _take_out(_take_in(blk["conv1"]["kernel"], g, count), g), k1)}
        blk["conv2"] = {"kernel": noisy(
            _take_out(_take_in(blk["conv2"]["kernel"], g, count), g), k2)}
        for bn in ("bn1", "bn2"):
            widen_bn(blk, bst, bn)

    for head in ("policy_conv", "value_conv"):
        params[head] = {
            "kernel": _take_in(params[head]["kernel"], g, count)}
    return {"params": params, "batch_stats": stats}


def deepen(variables: Dict[str, Any], new_blocks: int,
           key: jax.Array) -> Dict[str, Any]:
    """Append identity residual blocks (zero second conv). Exact."""
    params = jax.tree.map(lambda x: x, variables["params"])
    stats = jax.tree.map(lambda x: x, variables["batch_stats"])
    old_blocks = sum(1 for name in params if name.startswith("block"))
    assert new_blocks >= old_blocks, (new_blocks, old_blocks)
    c = params["stem_conv"]["kernel"].shape[-1]
    he = jax.nn.initializers.he_normal()
    ones, zeros = jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32)
    for i in range(old_blocks, new_blocks):
        key, k1 = jax.random.split(key)
        params[f"block{i}"] = {
            "conv1": {"kernel": he(k1, (3, 3, c, c), jnp.float32)},
            "conv2": {"kernel": jnp.zeros((3, 3, c, c), jnp.float32)},
            "bn1": {"scale": ones, "bias": zeros},
            "bn2": {"scale": ones, "bias": zeros},
        }
        stats[f"block{i}"] = {
            "bn1": {"mean": zeros, "var": ones},
            "bn2": {"mean": zeros, "var": ones},
        }
    return {"params": params, "batch_stats": stats}


def resize_board(variables: Dict[str, Any], old_size: int,
                 new_size: int) -> Dict[str, Any]:
    """Rebuild the FC heads for a new board size by spatial interpolation
    of their kernels (the conv trunk transfers untouched)."""
    params = jax.tree.map(lambda x: x, variables["params"])
    stats = jax.tree.map(lambda x: x, variables["batch_stats"])
    if new_size == old_size:
        return {"params": params, "batch_stats": stats}
    so, sn = old_size, new_size
    area_fix = (so / sn) ** 2

    # policy FC: rows are the flattened [S, S, 2] policy_conv output
    # (channel-minor), columns the [S, S] action grid
    pk = params["policy_fc"]["kernel"].reshape(so, so, 2, so, so)
    pk = jax.image.resize(pk, (sn, sn, 2, sn, sn), "linear") * area_fix
    pb = params["policy_fc"]["bias"].reshape(so, so)
    pb = jax.image.resize(pb, (sn, sn), "linear")
    params["policy_fc"] = {"kernel": pk.reshape(2 * sn * sn, sn * sn),
                           "bias": pb.reshape(sn * sn)}

    # value FC1: H spatial maps over the [S, S] value_conv output
    h = params["value_fc1"]["kernel"].shape[-1]
    vk = params["value_fc1"]["kernel"].reshape(so, so, h)
    vk = jax.image.resize(vk, (sn, sn, h), "linear") * area_fix
    params["value_fc1"] = {"kernel": vk.reshape(sn * sn, h),
                           "bias": params["value_fc1"]["bias"]}
    return {"params": params, "batch_stats": stats}


def transfer(variables: Dict[str, Any], src_env: EnvConfig,
             src_net: NetConfig, dst_env: EnvConfig, dst_net: NetConfig,
             key: jax.Array, noise: float = 1e-2) -> Dict[str, Any]:
    """Full surgery: widen → deepen → resize, source model → dst preset."""
    assert dst_net.channels >= src_net.channels, "cannot narrow"
    assert dst_net.blocks >= src_net.blocks, "cannot shallow"
    assert dst_net.value_hidden == src_net.value_hidden, \
        "value_hidden mismatch (resize not supported)"
    k1, k2 = jax.random.split(key)
    v = widen(variables, dst_net.channels, k1, noise=noise)
    v = deepen(v, dst_net.blocks, k2)
    v = resize_board(v, src_env.board_size, dst_env.board_size)
    # sanity: the result must match the dst preset's init tree exactly
    from alphafive_tpu.models.resnet import init_variables
    ref = init_variables(dst_env, dst_net, jax.random.key(0))
    ref = {"params": ref["params"], "batch_stats": ref.get("batch_stats", {})}
    got = jax.tree.map(lambda x: (x.shape, x.dtype), v)
    want = jax.tree.map(lambda x: (x.shape, x.dtype), ref)
    assert got == want, "surgery produced a mismatched parameter tree"
    return v
