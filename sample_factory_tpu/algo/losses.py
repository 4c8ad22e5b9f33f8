"""PPO loss components with valids masking.

Parity: reference `sample_factory/algo/learning/learner.py` — `_policy_loss`
(:431), `_value_loss` (:441), `_kl_loss` (:461), entropy / symmetric-KL
exploration losses (:474-487), advantage normalization with valids (:646-647),
ratio clamp (:583). The reference's `masked_select(...).mean()` becomes a
masked mean (identical value, static shapes for XLA).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

RATIO_CLAMP_MIN = 0.05
RATIO_CLAMP_MAX = 20.0


def masked_mean(x: jnp.ndarray, valids: jnp.ndarray) -> jnp.ndarray:
    v = valids.astype(x.dtype)
    return jnp.sum(x * v) / jnp.maximum(jnp.sum(v), 1.0)


def normalize_advantages(adv: jnp.ndarray, valids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked advantage normalization; returns (normalized_adv, mean, std).

    Uses the unbiased (ddof=1) std to match the reference's torch.std_mean.
    """
    v = valids.astype(adv.dtype)
    n = jnp.maximum(jnp.sum(v), 1.0)
    mean = jnp.sum(adv * v) / n
    var = jnp.sum(jnp.square(adv - mean) * v) / jnp.maximum(n - 1.0, 1.0)
    std = jnp.sqrt(var)
    return (adv - mean) / jnp.maximum(std, 1e-7), mean, std


def clamp_ratio(ratio: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(ratio, RATIO_CLAMP_MIN, RATIO_CLAMP_MAX)


def policy_loss(ratio, adv, clip_ratio_low, clip_ratio_high, valids) -> jnp.ndarray:
    clipped_ratio = jnp.clip(ratio, clip_ratio_low, clip_ratio_high)
    loss_unclipped = ratio * adv
    loss_clipped = clipped_ratio * adv
    loss = jnp.minimum(loss_unclipped, loss_clipped)
    return -masked_mean(loss, valids)


def value_loss(new_values, old_values, target, clip_value, valids, value_loss_coeff) -> jnp.ndarray:
    value_clipped = old_values + jnp.clip(new_values - old_values, -clip_value, clip_value)
    original = jnp.square(new_values - target)
    clipped = jnp.square(value_clipped - target)
    loss = jnp.maximum(original, clipped)
    return masked_mean(loss, valids) * value_loss_coeff


def entropy_exploration_loss(entropy, valids, exploration_loss_coeff) -> jnp.ndarray:
    return -exploration_loss_coeff * masked_mean(entropy, valids)


def symmetric_kl_exploration_loss(kl_prior, valids, exploration_loss_coeff) -> jnp.ndarray:
    kl = masked_mean(kl_prior, valids)
    kl = jnp.where(jnp.isfinite(kl), kl, 0.0)
    kl = jnp.minimum(kl, 30.0)
    return exploration_loss_coeff * kl


def kl_loss(kl_old, valids, kl_loss_coeff) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (kl_old_mean, kl_loss)."""
    kl_old_mean = masked_mean(kl_old, valids)
    return kl_old_mean, kl_old_mean * kl_loss_coeff
