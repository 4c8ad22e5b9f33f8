"""PPO loss components: masked-mean semantics, clipping behavior, LR schedules."""

import numpy as np

import jax.numpy as jnp

from sample_factory_tpu.algo.losses import (
    masked_mean,
    normalize_advantages,
    policy_loss,
    value_loss,
)
from sample_factory_tpu.algo.schedules import kl_adaptive_lr_update


def test_masked_mean_equals_masked_select_mean():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100,)).astype(np.float32)
    valids = (rng.random(100) < 0.7).astype(np.float32)
    got = float(masked_mean(jnp.asarray(x), jnp.asarray(valids)))
    expected = x[valids > 0].mean()
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_policy_loss_invariant_to_invalid_data():
    """The splice-invalid-data invariant from reference tests/algo/test_learner.py:108-168:
    garbage in invalid slots must not change the loss."""
    rng = np.random.default_rng(1)
    n = 64
    ratio = np.exp(rng.normal(size=n).astype(np.float32) * 0.1)
    adv = rng.normal(size=n).astype(np.float32)
    valids = np.ones(n, dtype=np.float32)
    valids[10:20] = 0.0

    base = float(policy_loss(jnp.asarray(ratio), jnp.asarray(adv), 1 / 1.1, 1.1, jnp.asarray(valids)))

    ratio2, adv2 = ratio.copy(), adv.copy()
    ratio2[10:20] = 17.3
    adv2[10:20] = -1e3
    spliced = float(policy_loss(jnp.asarray(ratio2), jnp.asarray(adv2), 1 / 1.1, 1.1, jnp.asarray(valids)))
    np.testing.assert_allclose(base, spliced, rtol=1e-6)


def test_policy_loss_unclipped_region():
    # ratio inside clip region, negative advantage: loss = -mean(ratio*adv)
    ratio = jnp.asarray([1.0, 1.05])
    adv = jnp.asarray([1.0, -1.0])
    valids = jnp.ones(2)
    loss = float(policy_loss(ratio, adv, 1 / 1.1, 1.1, valids))
    np.testing.assert_allclose(loss, -np.mean([1.0 * 1.0, 1.05 * -1.0]), rtol=1e-6)


def test_value_loss_clipping():
    new_values = jnp.asarray([5.0])
    old_values = jnp.asarray([0.0])
    target = jnp.asarray([10.0])
    # clip_value=1: clipped value = 0 + clip(5-0, -1, 1) = 1 -> clipped loss (1-10)^2=81 > (5-10)^2=25
    loss = float(value_loss(new_values, old_values, target, 1.0, jnp.ones(1), value_loss_coeff=0.5))
    np.testing.assert_allclose(loss, 0.5 * 81.0, rtol=1e-6)


def test_normalize_advantages_masked():
    rng = np.random.default_rng(2)
    adv = rng.normal(size=200).astype(np.float32) * 4 + 3
    valids = (rng.random(200) < 0.6).astype(np.float32)
    normalized, mean, std = normalize_advantages(jnp.asarray(adv), jnp.asarray(valids))
    sel = adv[valids > 0]
    np.testing.assert_allclose(float(mean), sel.mean(), rtol=1e-4)
    np.testing.assert_allclose(float(std), sel.std(ddof=1), rtol=1e-4)
    got = np.asarray(normalized)[valids > 0]
    np.testing.assert_allclose(got.mean(), 0.0, atol=1e-5)


def test_kl_adaptive_lr():
    lr = 1e-3
    thresh = 0.008
    # high KL -> decrease
    assert float(kl_adaptive_lr_update(jnp.asarray(lr), jnp.asarray(0.1), thresh, 1e-6, 1e-2)) < lr
    # low KL -> increase
    assert float(kl_adaptive_lr_update(jnp.asarray(lr), jnp.asarray(1e-5), thresh, 1e-6, 1e-2)) > lr
    # in-band -> unchanged
    np.testing.assert_allclose(float(kl_adaptive_lr_update(jnp.asarray(lr), jnp.asarray(thresh), thresh, 1e-6, 1e-2)), lr)
    # respects bounds
    np.testing.assert_allclose(float(kl_adaptive_lr_update(jnp.asarray(1e-6), jnp.asarray(1.0), thresh, 1e-6, 1e-2)), 1e-6)
