"""Learner-specific units: KL-adaptive lr, loss anatomy, optimizer wiring.

The reference adapts an lr multiplier from KL(π_old‖π_new) after each
update phase and early-stops runaway updates (SURVEY.md §3.1
`policy_update`); these tests pin our mirror of that behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np

from alphafive_tpu.config import get_preset
from alphafive_tpu.env import vector
from alphafive_tpu.train import learner


def _state(cfg):
    return learner.init_train_state(cfg.env, cfg.net, cfg.train,
                                    jax.random.key(0))


def test_adapt_lr_scale_directions():
    cfg = get_preset("tiny_test")
    ts = _state(cfg)
    target = cfg.train.kl_target
    up = learner.adapt_lr_scale(ts, jnp.float32(target / 4), target)
    down = learner.adapt_lr_scale(ts, jnp.float32(target * 4), target)
    mid = learner.adapt_lr_scale(ts, jnp.float32(target), target)
    assert float(up.lr_scale) > 1.0
    assert float(down.lr_scale) < 1.0
    assert float(mid.lr_scale) == 1.0


def test_adapt_lr_scale_clamped():
    cfg = get_preset("tiny_test")
    ts = _state(cfg)
    for _ in range(20):
        ts = learner.adapt_lr_scale(ts, jnp.float32(1e9),
                                    cfg.train.kl_target)
    assert float(ts.lr_scale) >= 0.1 - 1e-6
    ts2 = _state(cfg)
    for _ in range(20):
        ts2 = learner.adapt_lr_scale(ts2, jnp.float32(0.0),
                                     cfg.train.kl_target)
    assert float(ts2.lr_scale) <= 10.0 + 1e-6


def test_loss_terms_zero_masked_value():
    """Positions with z_valid=0 contribute nothing to the value loss."""
    cfg = get_preset("tiny_test")
    ts = _state(cfg)
    b = 16
    s = cfg.env.board_size
    feats = jnp.zeros((b, s, s, 4), jnp.float32)
    pi = jnp.ones((b, cfg.env.num_actions)) / cfg.env.num_actions
    z = jnp.ones((b,))
    zv_none = jnp.zeros((b,))
    from alphafive_tpu.models.resnet import PolicyValueNet
    model = PolicyValueNet(cfg.env, cfg.net)
    _, (_, aux) = learner.loss_fn(ts.params, ts.batch_stats, model,
                                  (feats, pi, z, zv_none), cfg.train)
    assert float(aux["value_loss"]) == 0.0
    _, (_, aux2) = learner.loss_fn(ts.params, ts.batch_stats, model,
                                   (feats, pi, z, jnp.ones((b,))),
                                   cfg.train)
    assert float(aux2["value_loss"]) > 0.0


def test_sgd_option_steps():
    import dataclasses
    cfg = get_preset("tiny_test")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, optimizer="sgd"))
    ts = _state(cfg)
    b = 8
    s = cfg.env.board_size
    batch = (jnp.zeros((b, s, s, 4)),
             jnp.ones((b, cfg.env.num_actions)) / cfg.env.num_actions,
             jnp.zeros((b,)), jnp.ones((b,)))
    ts2, aux = jax.jit(
        lambda t: learner.train_step(cfg.env, cfg.net, cfg.train, t, batch)
    )(ts)
    assert int(ts2.step) == 1
    assert np.isfinite(float(aux["loss"]))
