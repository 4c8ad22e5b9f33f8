"""GAE and V-trace as `lax.scan` over time — the TPU-native form of the
reference's jit-scripted loops.

Parity: reference `sample_factory/algo/utils/rl_utils.py:51-94`
(calculate_discounted_sum_torch / gae_advantages with valids masking) and the
V-trace recursion in `sample_factory/algo/learning/learner.py:602-639`.
Numerics match the reference exactly (including its convention that the last
V-trace delta is zero for non-terminal rollout ends).

Layout: time-major [T, ...] — scan's native axis. The reference stores [E, T]
and transposes; we keep [T, E] end to end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discounted_sum(x, dones, valids, discount: float, x_last=None):
    """Reverse discounted cumulative sum with episode-boundary resets.

    x: [T, ...] already multiplied by valids; dones/valids: [T, ...];
    invalid steps pass the accumulator through undiscounted (discount 1),
    matching reference rl_utils.py:52-75.
    """
    if x_last is None:
        x_last = jnp.zeros_like(x[-1])

    def body(cumulative, inp):
        x_t, done_t, valid_t = inp
        discount_valid = discount * valid_t + (1.0 - valid_t)
        cumulative = x_t + discount_valid * cumulative * (1.0 - done_t)
        return cumulative, cumulative

    _, out = jax.lax.scan(body, x_last, (x, dones, valids), reverse=True)
    return out


def gae_advantages(rewards, dones, values, valids, gamma: float, gae_lambda: float):
    """Generalized advantage estimation with valids masking.

    rewards/dones: [T, E]; values/valids: [T+1, E]. Returns advantages [T, E].
    Matches reference rl_utils.py:77-94.
    """
    dones = dones.astype(jnp.float32)
    valids = valids.astype(jnp.float32)
    deltas = (rewards - values[:-1]) * valids[:-1] + (1.0 - dones) * (gamma * values[1:] * valids[1:])
    return discounted_sum(deltas, dones, valids[:-1], gamma * gae_lambda)


def vtrace(rewards, dones, values, ratios, gamma: float, rho_hat: float = 1.0, c_hat: float = 1.0):
    """V-trace targets and advantages over a rollout segment.

    rewards/dones/values/ratios: [T, E] (values are the behavior-time V(s_t)
    estimates re-evaluated by the current critic). Returns (vs, adv), both [T, E].

    Matches the reference recursion (learner.py:602-639), including its
    bootstrap convention: next_values at the segment end is (V[T-1]-r[T-1])/gamma
    so the final delta vanishes for non-terminal segment ends.
    """
    dones = dones.astype(jnp.float32)
    vtrace_rho = jnp.minimum(rho_hat, ratios)
    vtrace_c = jnp.minimum(c_hat, ratios)

    next_values_init = (values[-1] - rewards[-1]) / gamma
    next_vs_init = next_values_init

    def body(carry, inp):
        next_values, next_vs = carry
        r, done, v, rho, c = inp
        not_done_gamma = (1.0 - done) * gamma
        delta_s = rho * (r + not_done_gamma * next_values - v)
        adv = rho * (r + not_done_gamma * next_vs - v)
        vs = v + delta_s + not_done_gamma * c * (next_vs - next_values)
        return (v, vs), (vs, adv)

    _, (vs, adv) = jax.lax.scan(
        body,
        (next_values_init, next_vs_init),
        (rewards, dones, values, vtrace_rho, vtrace_c),
        reverse=True,
    )
    return vs, adv
