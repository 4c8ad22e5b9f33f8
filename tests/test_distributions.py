"""Action distribution invariants.

Modeled on reference tests/algo/test_action_distributions.py: sampling
frequencies, log-probs vs. an independent (torch) implementation, KL, masking,
tuple distributions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sample_factory_tpu.algo.distributions import (
    CategoricalDistribution,
    ContinuousDistribution,
    get_action_distribution,
    sample_actions_log_probs,
)
from sample_factory_tpu.envs.spaces import Box, Discrete, TupleSpec, num_action_parameters


def test_categorical_log_prob_matches_softmax():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(64, 7)).astype(np.float32)
    d = CategoricalDistribution(jnp.asarray(logits))
    actions = rng.integers(0, 7, size=(64, 1))
    lp = np.asarray(d.log_prob(jnp.asarray(actions)))

    # manual log softmax
    x = logits - logits.max(axis=-1, keepdims=True)
    ref_lp = x - np.log(np.exp(x).sum(axis=-1, keepdims=True))
    expected = np.take_along_axis(ref_lp, actions, axis=-1)[:, 0]
    np.testing.assert_allclose(lp, expected, rtol=1e-3, atol=1e-4)


def test_categorical_sampling_frequencies():
    probs = np.array([0.1, 0.2, 0.3, 0.4], dtype=np.float32)
    logits = np.log(probs)
    d = CategoricalDistribution(jnp.asarray(np.tile(logits, (20000, 1))))
    samples = np.asarray(d.sample(jax.random.PRNGKey(42)))[:, 0]
    freq = np.bincount(samples, minlength=4) / len(samples)
    np.testing.assert_allclose(freq, probs, atol=0.02)


def test_categorical_entropy_and_kl():
    logits_p = jnp.asarray(np.random.default_rng(1).normal(size=(32, 5)).astype(np.float32))
    logits_q = jnp.asarray(np.random.default_rng(2).normal(size=(32, 5)).astype(np.float32))
    p = CategoricalDistribution(logits_p)
    q = CategoricalDistribution(logits_q)
    kl = np.asarray(p.kl_divergence(q))
    assert (kl >= -1e-5).all()
    np.testing.assert_allclose(np.asarray(p.kl_divergence(p)), 0.0, atol=1e-5)
    ent = np.asarray(p.entropy())
    assert (ent >= 0).all() and (ent <= np.log(5) + 1e-5).all()

    # uniform distribution maximizes entropy; sym KL with uniform prior is ~0 there
    uniform = CategoricalDistribution(jnp.zeros((4, 5)))
    np.testing.assert_allclose(np.asarray(uniform.entropy()), np.log(5), atol=1e-6)
    np.testing.assert_allclose(np.asarray(uniform.symmetric_kl_with_uniform_prior()), 0.0, atol=1e-6)


def test_categorical_action_masking():
    logits = jnp.asarray(np.random.default_rng(3).normal(size=(256, 6)).astype(np.float32))
    mask = np.ones((256, 6), dtype=np.float32)
    mask[:, 2] = 0
    mask[:, 5] = 0
    d = CategoricalDistribution(logits, action_mask=jnp.asarray(mask))
    samples = np.asarray(d.sample(jax.random.PRNGKey(0)))[:, 0]
    assert not np.isin(samples, [2, 5]).any()
    probs = np.asarray(d.probs)
    np.testing.assert_allclose(probs[:, [2, 5]], 0.0, atol=1e-8)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_continuous_log_prob_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    means = rng.normal(size=(32, 3)).astype(np.float32)
    log_std = rng.normal(size=(32, 3)).astype(np.float32) * 0.3
    params = np.concatenate([means, log_std], axis=-1)
    actions = rng.normal(size=(32, 3)).astype(np.float32)

    d = ContinuousDistribution(jnp.asarray(params))
    lp = np.asarray(d.log_prob(jnp.asarray(actions)))
    ent = np.asarray(d.entropy())

    tdist = torch.distributions.Independent(
        torch.distributions.Normal(torch.tensor(means), torch.tensor(np.exp(log_std))), 1
    )
    np.testing.assert_allclose(lp, tdist.log_prob(torch.tensor(actions)).numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ent, tdist.entropy().numpy(), rtol=1e-4, atol=1e-4)


def test_continuous_kl_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    p_params = rng.normal(size=(16, 8)).astype(np.float32)
    q_params = rng.normal(size=(16, 8)).astype(np.float32)
    p = ContinuousDistribution(jnp.asarray(p_params))
    q = ContinuousDistribution(jnp.asarray(q_params))
    kl = np.asarray(p.kl_divergence(q))

    def t(params):
        m, ls = np.split(params, 2, axis=-1)
        return torch.distributions.Independent(
            torch.distributions.Normal(torch.tensor(m), torch.tensor(np.clip(np.exp(ls), 1e-4, 1e4))), 1
        )

    ref = torch.distributions.kl.kl_divergence(t(p_params), t(q_params)).numpy()
    np.testing.assert_allclose(kl, ref, rtol=1e-4, atol=1e-4)


def test_tuple_distribution():
    space = TupleSpec((Discrete(3), Box((2,)), Discrete(4)))
    n_params = num_action_parameters(space)
    assert n_params == 3 + 4 + 4
    logits = jnp.asarray(np.random.default_rng(6).normal(size=(16, n_params)).astype(np.float32))
    d = get_action_distribution(space, logits)
    actions, lp = sample_actions_log_probs(d, jax.random.PRNGKey(7))
    assert actions.shape == (16, 1 + 2 + 1)
    assert lp.shape == (16,)
    # log_prob of sampled actions must equal the returned log-probs
    np.testing.assert_allclose(np.asarray(d.log_prob(actions)), np.asarray(lp), rtol=1e-5, atol=1e-5)
    # entropy is the sum of component entropies => at least the continuous entropy
    assert np.all(np.isfinite(np.asarray(d.entropy())))
    kl_self = np.asarray(d.kl_divergence(get_action_distribution(space, logits)))
    np.testing.assert_allclose(kl_self, 0.0, atol=1e-5)


def test_gaussian_sampling_moments():
    means = np.array([[1.0, -2.0]], dtype=np.float32)
    log_std = np.array([[0.0, 0.5]], dtype=np.float32)
    params = jnp.asarray(np.tile(np.concatenate([means, log_std], -1), (50000, 1)))
    d = ContinuousDistribution(params)
    samples = np.asarray(d.sample(jax.random.PRNGKey(8)))
    np.testing.assert_allclose(samples.mean(0), means[0], atol=0.03)
    np.testing.assert_allclose(samples.std(0), np.exp(log_std[0]), atol=0.03)
