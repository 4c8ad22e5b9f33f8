"""Optimizers: Adam (optax) and LAMB with trust-ratio clamping.

Parity: reference `sample_factory/algo/utils/optimizers.py` (Lamb from bps-nav:
per-parameter trust ratio = min(||w||, 10)/||adam_step|| clamped to
[min_trust, 1/min_trust]; adam step with bias correction and decoupled weight
decay). Implemented as an optax gradient transformation so it composes with
grad clipping and dynamic LR injection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaleByLambState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def scale_by_lamb_trust(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 1e-4,
    min_trust: float = 0.01,
    bias_correction: bool = True,
) -> optax.GradientTransformation:
    def init_fn(params):
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        return ScaleByLambState(count=jnp.zeros((), jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        assert params is not None, "LAMB requires params"
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)

        if bias_correction:
            bc1 = 1 - b1 ** count.astype(jnp.float32)
            bc2 = 1 - b2 ** count.astype(jnp.float32)
        else:
            bc1 = bc2 = 1.0

        def adam_step(m, v, p):
            m_hat = m / bc1
            v_hat = jnp.sqrt(v) / jnp.sqrt(bc2)
            step = m_hat / (v_hat + eps)
            if weight_decay > 0:
                step = step + weight_decay * p
            return step

        steps = jax.tree.map(adam_step, mu, nu, params)

        def apply_trust(step, p):
            if min_trust == 1.0:
                return step
            weight_norm = jnp.linalg.norm(p.reshape(-1))
            step_norm = jnp.linalg.norm(step.reshape(-1))
            trust = jnp.where(
                (weight_norm == 0) | (step_norm == 0),
                1.0,
                jnp.clip(jnp.minimum(weight_norm, 10.0) / jnp.maximum(step_norm, 1e-20), min_trust, 1.0 / min_trust),
            )
            return step * trust

        out = jax.tree.map(apply_trust, steps, params)
        # negate: downstream scale_by_learning_rate handles the sign via scale(-lr)
        return out, ScaleByLambState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    count: jnp.ndarray
    slow: optax.Params


def lookahead(k: int = 10, alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead (Zhang et al. 2019) as a terminal transform — reference
    `algo/utils/optimizers.py` Lamb(use_look_ahead=True, look_ahead_alpha=0.5,
    look_ahead_k=10): after every k-th update, slow <- (1-alpha)*slow +
    alpha*fast and the fast weights snap back to slow (the reference's step
    counter starts at 0, so the first update also syncs). Must be placed
    AFTER scale_by_learning_rate: it transforms FINAL updates using the
    incoming params."""

    def init_fn(params):
        return LookaheadState(count=jnp.zeros((), jnp.int32), slow=jax.tree.map(jnp.asarray, params))

    def update_fn(updates, state, params=None):
        assert params is not None, "lookahead requires params"
        sync = (state.count % k) == 0
        fast = jax.tree.map(lambda p, u: p + u, params, updates)
        new_slow = jax.tree.map(lambda s, f: jnp.where(sync, (1.0 - alpha) * s + alpha * f, s), state.slow, fast)
        out = jax.tree.map(lambda f, s, p: jnp.where(sync, s, f) - p, fast, new_slow, params)
        return out, LookaheadState(count=state.count + 1, slow=new_slow)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Build the optimizer chain: grad clip -> adam/lamb -> dynamic LR.

    Learning rate is injected via optax.inject_hyperparams so KL-adaptive and
    PBT-driven LR changes mutate opt_state.hyperparams['learning_rate'] without
    recompilation (the TPU analog of the reference's _apply_lr, learner.py:493).
    """

    def build(learning_rate):
        # NOTE: grad clipping is NOT part of the chain — the learner clips
        # manually so --max_grad_norm can be a traced per-policy value (PBT)
        parts = []
        if cfg.optimizer == "adam":
            parts.append(optax.scale_by_adam(b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_eps))
        elif cfg.optimizer == "lamb":
            parts.append(scale_by_lamb_trust(b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_eps))
        else:
            raise ValueError(f"Unknown optimizer {cfg.optimizer}")
        parts.append(optax.scale_by_learning_rate(learning_rate))  # scale(-lr)
        if cfg.optimizer == "lamb" and getattr(cfg, "lamb_lookahead", False):
            parts.append(lookahead(k=cfg.lamb_lookahead_k, alpha=cfg.lamb_lookahead_alpha))
        return optax.chain(*parts)

    return optax.inject_hyperparams(build)(learning_rate=cfg.learning_rate)


def get_current_lr(opt_state) -> jnp.ndarray:
    return opt_state.hyperparams["learning_rate"]


def set_current_lr(opt_state, lr):
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state
