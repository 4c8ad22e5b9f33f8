"""GAE / V-trace numerics vs. independent numpy reference loops.

The numpy oracles below re-state the published algorithm semantics (GAE paper
section 3 with valids skipping; V-trace recursion from IMPALA with the
reference's segment-end bootstrap convention) — cross-checked against
reference rl_utils.py:51-94 and learner.py:602-639 behavior.
"""

import numpy as np

import jax.numpy as jnp

from sample_factory_tpu.algo.advantages import discounted_sum, gae_advantages, vtrace


def np_discounted_sum(x, dones, valids, discount, x_last=None):
    if x_last is None:
        x_last = np.zeros_like(x[-1])
    cumulative = x_last.copy()
    out = np.zeros_like(x)
    for i in reversed(range(len(x))):
        discount_valid = discount * valids[i] + (1 - valids[i])
        cumulative = x[i] + discount_valid * cumulative * (1.0 - dones[i])
        out[i] = cumulative
    return out


def np_gae(rewards, dones, values, valids, gamma, lam):
    deltas = (rewards - values[:-1]) * valids[:-1] + (1 - dones) * (gamma * values[1:] * valids[1:])
    return np_discounted_sum(deltas, dones, valids[:-1], gamma * lam)


def _random_batch(T=16, E=8, seed=0):
    rng = np.random.default_rng(seed)
    rewards = rng.normal(size=(T, E)).astype(np.float32)
    dones = (rng.random(size=(T, E)) < 0.1).astype(np.float32)
    values = rng.normal(size=(T + 1, E)).astype(np.float32)
    valids = np.ones((T + 1, E), dtype=np.float32)
    return rewards, dones, values, valids


def test_gae_matches_numpy_oracle():
    rewards, dones, values, valids = _random_batch()
    adv = np.asarray(gae_advantages(jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(values), jnp.asarray(valids), 0.99, 0.95))
    ref = np_gae(rewards, dones, values, valids, 0.99, 0.95)
    np.testing.assert_allclose(adv, ref, rtol=1e-5, atol=1e-5)


def test_gae_with_invalid_steps():
    rewards, dones, values, valids = _random_batch(seed=1)
    valids[3:6, 2] = 0.0
    valids[10, :] = 0.0
    adv = np.asarray(gae_advantages(jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(values), jnp.asarray(valids), 0.99, 0.95))
    ref = np_gae(rewards, dones, values, valids, 0.99, 0.95)
    np.testing.assert_allclose(adv, ref, rtol=1e-5, atol=1e-5)


def test_gae_simple_analytic_case():
    # single env, no dones: A_t = delta_t + (gamma*lam) A_{t+1}
    gamma, lam = 0.9, 0.8
    rewards = np.array([[1.0], [1.0], [1.0]], dtype=np.float32)
    dones = np.zeros((3, 1), dtype=np.float32)
    values = np.array([[0.5], [0.6], [0.7], [0.8]], dtype=np.float32)
    valids = np.ones((4, 1), dtype=np.float32)
    deltas = rewards[:, 0] + gamma * values[1:, 0] - values[:-1, 0]
    expected = np.zeros(3)
    acc = 0.0
    for i in reversed(range(3)):
        acc = deltas[i] + gamma * lam * acc
        expected[i] = acc
    adv = np.asarray(
        gae_advantages(jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(values), jnp.asarray(valids), gamma, lam)
    )[:, 0]
    np.testing.assert_allclose(adv, expected, rtol=1e-5, atol=1e-6)


def test_discounted_sum_resets_at_done():
    x = np.ones((4, 1), dtype=np.float32)
    dones = np.array([[0.0], [1.0], [0.0], [0.0]], dtype=np.float32)
    valids = np.ones((4, 1), dtype=np.float32)
    out = np.asarray(discounted_sum(jnp.asarray(x), jnp.asarray(dones), jnp.asarray(valids), 0.5))
    # t=3: 1; t=2: 1+0.5*1=1.5; t=1: done -> 1; t=0: 1+0.5*1=1.5
    np.testing.assert_allclose(out[:, 0], [1.5, 1.0, 1.5, 1.0])


def np_vtrace(rewards, dones, values, ratios, gamma, rho_hat, c_hat):
    T, E = rewards.shape
    rho = np.minimum(rho_hat, ratios)
    c = np.minimum(c_hat, ratios)
    vs = np.zeros((T, E))
    adv = np.zeros((T, E))
    next_values = (values[-1] - rewards[-1]) / gamma
    next_vs = next_values.copy()
    for i in reversed(range(T)):
        not_done_gamma = (1.0 - dones[i]) * gamma
        delta_s = rho[i] * (rewards[i] + not_done_gamma * next_values - values[i])
        adv[i] = rho[i] * (rewards[i] + not_done_gamma * next_vs - values[i])
        next_vs = values[i] + delta_s + not_done_gamma * c[i] * (next_vs - next_values)
        vs[i] = next_vs
        next_values = values[i]
    return vs, adv


def test_vtrace_matches_numpy_oracle():
    rng = np.random.default_rng(2)
    T, E = 12, 6
    rewards = rng.normal(size=(T, E)).astype(np.float32)
    dones = (rng.random(size=(T, E)) < 0.15).astype(np.float32)
    values = rng.normal(size=(T, E)).astype(np.float32)
    ratios = np.exp(rng.normal(size=(T, E)).astype(np.float32) * 0.2)
    vs, adv = vtrace(jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(values), jnp.asarray(ratios), 0.99, 1.0, 1.0)
    ref_vs, ref_adv = np_vtrace(rewards, dones, values, ratios, 0.99, 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(vs), ref_vs, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(adv), ref_adv, rtol=1e-4, atol=1e-4)


def test_vtrace_on_policy_reduces_to_bellman():
    """With ratio=1 and no dones, vs should satisfy the n-step TD identity."""
    rng = np.random.default_rng(3)
    T, E = 8, 2
    rewards = rng.normal(size=(T, E)).astype(np.float32)
    dones = np.zeros((T, E), dtype=np.float32)
    values = rng.normal(size=(T, E)).astype(np.float32)
    ratios = np.ones((T, E), dtype=np.float32)
    vs, adv = vtrace(jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(values), jnp.asarray(ratios), 0.99, 1.0, 1.0)
    ref_vs, ref_adv = np_vtrace(rewards, dones, values, ratios, 0.99, 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(vs), ref_vs, rtol=1e-5, atol=1e-5)
