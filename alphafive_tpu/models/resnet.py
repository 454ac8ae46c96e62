"""Residual policy-value network (Flax Linen).

The reference's net is a TF-graph conv stem → N residual blocks →
policy head (1×1 conv → FC → log-softmax over board²) + value head
(1×1 conv → FC → tanh), loss = value MSE + policy CE + L2
(SURVEY.md §1 L3, §2 "Policy-value net", §3.3). TPU-first choices here:

  * NHWC layout, bfloat16 compute / float32 params (MXU-friendly), float32
    heads and softmax for numeric stability.
  * BatchNorm with running stats carried functionally (`batch_stats`), eval
    mode inside MCTS leaf evaluation.
  * Optional fused Pallas residual blocks for the inference hot path
    (ops/pallas_resblock.py), A/B-switchable vs pure XLA (SURVEY.md §7.9).

The net returns raw policy *logits*; masking + softmax over legal moves
happens in the search, matching the "masked softmax at the root" semantics.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from alphafive_tpu.config import EnvConfig, NetConfig


def _dtype(cfg: NetConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class ResBlock(nn.Module):
    channels: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.channels, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        return nn.relu(x + y)


class PolicyValueNet(nn.Module):
    """[B, S, S, 4] features → (policy_logits[B, S*S], value[B])."""

    env: EnvConfig
    net: NetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.net
        dt = _dtype(cfg)
        x = x.astype(dt)
        x = nn.Conv(cfg.channels, (3, 3), use_bias=False, dtype=dt,
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                         name="stem_bn")(x)
        x = nn.relu(x)
        for i in range(cfg.blocks):
            x = ResBlock(cfg.channels, dt, name=f"block{i}")(x, train)

        b = x.shape[0]
        a = self.env.num_actions

        # policy head: 1×1 conv (2 ch) → FC over board → logits
        p = nn.Conv(2, (1, 1), use_bias=False, dtype=dt, name="policy_conv")(x)
        p = nn.BatchNorm(use_running_average=not train, dtype=dt,
                         name="policy_bn")(p)
        p = nn.relu(p).reshape(b, -1).astype(jnp.float32)
        logits = nn.Dense(a, dtype=jnp.float32, name="policy_fc")(p)

        # value head: 1×1 conv (1 ch) → FC(hidden) → FC(1) → tanh
        v = nn.Conv(1, (1, 1), use_bias=False, dtype=dt, name="value_conv")(x)
        v = nn.BatchNorm(use_running_average=not train, dtype=dt,
                         name="value_bn")(v)
        v = nn.relu(v).reshape(b, -1).astype(jnp.float32)
        v = nn.relu(nn.Dense(cfg.value_hidden, dtype=jnp.float32,
                             name="value_fc1")(v))
        v = nn.Dense(1, dtype=jnp.float32, name="value_fc2")(v)
        return logits, jnp.tanh(v)[:, 0]


def init_variables(env: EnvConfig, net: NetConfig,
                   key: jax.Array) -> Dict[str, Any]:
    model = PolicyValueNet(env, net)
    x = jnp.zeros((1, env.board_size, env.board_size, 4), jnp.float32)
    return model.init(key, x, train=False)


def apply_eval(model: PolicyValueNet, params, batch_stats,
               features: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference forward (MCTS leaf eval): running BN stats, no mutation."""
    return model.apply({"params": params, "batch_stats": batch_stats},
                       features, train=False)


def apply_eval_fused(env: EnvConfig, net: NetConfig, params, batch_stats,
                     features: jnp.ndarray, interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference forward with Pallas-fused residual blocks (SURVEY.md §7.9).

    BatchNorm is folded into the convolutions (inference mode), each residual
    block runs as one Pallas kernel keeping activations in VMEM
    (ops/pallas_resblock.py), and the tiny stem/heads stay in XLA. Must be
    numerically equivalent (f32) to `apply_eval` — tests/test_pallas.py.
    """
    from alphafive_tpu.ops.pallas_resblock import (fold_batchnorm,
                                                   fused_resblock,
                                                   pack_conv_kernel)
    dt = _dtype(net)
    x = features.astype(dt)

    def fold(conv_name, bn_name):
        return fold_batchnorm(
            params[conv_name]["kernel"].astype(jnp.float32),
            params[bn_name]["scale"].astype(jnp.float32),
            params[bn_name]["bias"].astype(jnp.float32),
            batch_stats[bn_name]["mean"].astype(jnp.float32),
            batch_stats[bn_name]["var"].astype(jnp.float32))

    w, b = fold("stem_conv", "stem_bn")
    x = jax.lax.conv_general_dilated(
        x, w.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    x = nn.relu(x + b).astype(dt)

    for i in range(net.blocks):
        blk = params[f"block{i}"]
        bs = batch_stats[f"block{i}"]
        w1, b1 = fold_batchnorm(blk["conv1"]["kernel"].astype(jnp.float32),
                                blk["bn1"]["scale"], blk["bn1"]["bias"],
                                bs["bn1"]["mean"], bs["bn1"]["var"])
        w2, b2 = fold_batchnorm(blk["conv2"]["kernel"].astype(jnp.float32),
                                blk["bn2"]["scale"], blk["bn2"]["bias"],
                                bs["bn2"]["mean"], bs["bn2"]["var"])
        x = fused_resblock(x, pack_conv_kernel(w1).astype(dt), b1,
                           pack_conv_kernel(w2).astype(dt), b2,
                           interpret=interpret)

    bsz = x.shape[0]
    a = env.num_actions
    # policy head (1×1 conv == matmul over channels)
    wp, bp = fold("policy_conv", "policy_bn")
    p = jnp.einsum("bhwc,co->bhwo", x.astype(jnp.float32), wp[0, 0])
    p = nn.relu(p + bp).reshape(bsz, -1)
    logits = (p @ params["policy_fc"]["kernel"]
              + params["policy_fc"]["bias"])
    # value head
    wv, bv = fold("value_conv", "value_bn")
    v = jnp.einsum("bhwc,co->bhwo", x.astype(jnp.float32), wv[0, 0])
    v = nn.relu(v + bv).reshape(bsz, -1)
    v = nn.relu(v @ params["value_fc1"]["kernel"]
                + params["value_fc1"]["bias"])
    v = v @ params["value_fc2"]["kernel"] + params["value_fc2"]["bias"]
    return logits, jnp.tanh(v)[:, 0]


def apply_train(model: PolicyValueNet, params, batch_stats,
                features: jnp.ndarray):
    """Training forward: returns ((logits, value), new_batch_stats)."""
    (logits, value), mut = model.apply(
        {"params": params, "batch_stats": batch_stats}, features, train=True,
        mutable=["batch_stats"])
    return (logits, value), mut["batch_stats"]
