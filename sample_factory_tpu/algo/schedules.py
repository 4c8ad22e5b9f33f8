"""Learning-rate schedules as pure jittable update functions.

Parity: reference `sample_factory/algo/learning/learner.py:35-113`
(LearningRateScheduler / KlAdaptiveScheduler per-minibatch and per-epoch /
LinearDecayScheduler). The reference mutates optimizer param groups on the
host; here the LR is a traced scalar updated inside the fused train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def kl_adaptive_lr_update(curr_lr, mean_kl, kl_threshold: float, min_lr: float, max_lr: float):
    """If KL > 2*threshold: lr /= 1.5; if KL < 0.5*threshold: lr *= 1.5 (reference :57-66)."""
    lr = jnp.where(mean_kl > 2.0 * kl_threshold, jnp.maximum(curr_lr / 1.5, min_lr), curr_lr)
    lr = jnp.where(mean_kl < 0.5 * kl_threshold, jnp.minimum(lr * 1.5, max_lr), lr)
    return lr


def linear_decay_lr(base_lr: float, sgd_step, total_sgd_steps: int):
    frac = jnp.clip(1.0 - sgd_step.astype(jnp.float32) / max(1, total_sgd_steps), 0.0, 1.0)
    return base_lr * frac


def total_sgd_steps_for_linear_decay(cfg) -> int:
    """num_updates in the reference LinearDecayScheduler (:89-92)."""
    return max(1, cfg.train_for_env_steps // cfg.batch_size * cfg.num_epochs)


def lr_after_minibatch(cfg, curr_lr, mean_kl, sgd_step):
    """LR update applied after each minibatch (returns curr_lr unchanged for schedules
    that don't trigger per-minibatch)."""
    if cfg.lr_schedule == "kl_adaptive_minibatch":
        return kl_adaptive_lr_update(
            curr_lr, mean_kl, cfg.lr_schedule_kl_threshold, cfg.lr_adaptive_min, cfg.lr_adaptive_max
        )
    if cfg.lr_schedule == "linear_decay":
        return linear_decay_lr(cfg.learning_rate, sgd_step, total_sgd_steps_for_linear_decay(cfg))
    return curr_lr


def lr_after_epoch(cfg, curr_lr, mean_kl_over_epoch):
    if cfg.lr_schedule == "kl_adaptive_epoch":
        return kl_adaptive_lr_update(
            curr_lr, mean_kl_over_epoch, cfg.lr_schedule_kl_threshold, cfg.lr_adaptive_min, cfg.lr_adaptive_max
        )
    return curr_lr
