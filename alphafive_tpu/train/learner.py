"""Learner: loss, optimizer, one SGD step.

Loss mirrors the reference semantics (SURVEY.md §3.3): value MSE + policy
cross-entropy against the MCTS visit distribution + L2 on kernels, optimized
with Adam. Differences, by design:

  * The value term is masked by `z_valid` (positions from unfinished games
    have no value target — see train/actor.py) and renormalized; the policy
    term is likewise masked by `pi_valid` (cheap playout-cap-randomized
    searches are value-only positions, actor.py).
  * L2 is an explicit loss term over conv/dense kernels (the reference adds
    an L2 regularizer to the graph loss), so Adam sees it in the gradient —
    closer to the reference than decoupled weight decay.
  * Gradients are averaged over the `data` mesh axis with `psum` when run
    under shard_map (parallel/mesh.py) — the TPU-native replacement for the
    reference's single-GPU update (SURVEY.md §2 parallelism table).

Also computes KL(π_mcts ‖ p_net) — the quantity the reference uses for its
adaptive-lr early stopping — as a logged metric.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from alphafive_tpu.config import EnvConfig, NetConfig, TrainConfig
from alphafive_tpu.models.resnet import PolicyValueNet, apply_train


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray      # int32[]
    lr_scale: jnp.ndarray  # f32[] — KL-adaptive multiplier (SURVEY.md §3.1:
    # the reference adapts an lr multiplier from KL(π_old‖π_new) after each
    # update phase; we mirror that with ×1.5 / ÷1.5 clamped to [0.1, 10])


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.linear_schedule(
        init_value=0.0, end_value=cfg.learning_rate,
        transition_steps=max(cfg.lr_warmup_steps, 1))
    if cfg.optimizer == "sgd":
        opt = optax.sgd(schedule, momentum=cfg.momentum)
    else:
        opt = optax.adam(schedule)
    return optax.chain(optax.clip_by_global_norm(1.0), opt)


def init_train_state(env_cfg: EnvConfig, net_cfg: NetConfig,
                     train_cfg: TrainConfig, key: jax.Array) -> TrainState:
    from alphafive_tpu.models.resnet import init_variables
    variables = init_variables(env_cfg, net_cfg, key)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt = make_optimizer(train_cfg)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32),
                      lr_scale=jnp.ones((), jnp.float32))


def _l2_of_kernels(params) -> jnp.ndarray:
    acc = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if any(getattr(k, "key", None) == "kernel" for k in path):
            acc = acc + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return acc


def loss_fn(params, batch_stats, model: PolicyValueNet, batch,
            train_cfg: TrainConfig):
    feats, pi, z, z_valid, pi_valid = (batch if len(batch) == 5
                                       else (*batch, None))
    (logits, value), new_bs = apply_train(model, params, batch_stats, feats)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = jnp.sum(pi * logp, axis=-1)
    if pi_valid is None:
        policy_loss = -jnp.mean(ce)
    else:
        policy_loss = (-jnp.sum(ce * pi_valid)
                       / jnp.maximum(jnp.sum(pi_valid), 1.0))
    value_loss = (jnp.sum(jnp.square(value - z) * z_valid)
                  / jnp.maximum(jnp.sum(z_valid), 1.0))
    l2_loss = train_cfg.l2_coef * _l2_of_kernels(params)
    loss = policy_loss + train_cfg.value_loss_weight * value_loss + l2_loss
    # diagnostics (SURVEY.md §5.5): KL(π‖p), value MAE, policy entropy
    kl = jnp.mean(jnp.sum(jnp.where(pi > 0, pi * (jnp.log(
        jnp.maximum(pi, 1e-10)) - logp), 0.0), axis=-1))
    aux = {
        "loss": loss,
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "l2_loss": l2_loss,
        "kl_pi_p": kl,
        "value_mae": (jnp.sum(jnp.abs(value - z) * z_valid)
                      / jnp.maximum(jnp.sum(z_valid), 1.0)),
        "entropy_pi": -jnp.mean(jnp.sum(
            jnp.where(pi > 0, pi * jnp.log(jnp.maximum(pi, 1e-10)), 0.0),
            axis=-1)),
    }
    return loss, (new_bs, aux)


def train_step(env_cfg: EnvConfig, net_cfg: NetConfig,
               train_cfg: TrainConfig, ts: TrainState, batch,
               axis_name: Optional[str] = None
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step. Under shard_map, pass axis_name to pmean grads/stats."""
    model = PolicyValueNet(env_cfg, net_cfg)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, (new_bs, aux)), grads = grad_fn(ts.params, ts.batch_stats, model,
                                        batch, train_cfg)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        new_bs = jax.lax.pmean(new_bs, axis_name)
        aux = jax.lax.pmean(aux, axis_name)
    opt = make_optimizer(train_cfg)
    updates, new_opt = opt.update(grads, ts.opt_state, ts.params)
    updates = jax.tree.map(lambda u: u * ts.lr_scale, updates)
    params = optax.apply_updates(ts.params, updates)
    aux["grad_norm"] = optax.global_norm(grads)
    aux["lr_scale"] = ts.lr_scale
    return TrainState(params=params, batch_stats=new_bs, opt_state=new_opt,
                      step=ts.step + 1, lr_scale=ts.lr_scale), aux


def adapt_lr_scale(ts: TrainState, kl: jnp.ndarray,
                   kl_target: float) -> TrainState:
    """Reference-family adaptive lr: shrink when the update moved the policy
    too far (KL > 2·target), grow when it barely moved (KL < target/2)."""
    up = kl < kl_target / 2
    down = kl > kl_target * 2
    scale = ts.lr_scale * jnp.where(down, 1.0 / 1.5,
                                    jnp.where(up, 1.5, 1.0))
    return ts.replace(lr_scale=jnp.clip(scale, 0.1, 10.0))
