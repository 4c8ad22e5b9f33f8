"""Running mean/std vs. analytic values (modeled on reference tests/algo/test_rms.py)."""

import numpy as np

import jax.numpy as jnp

from sample_factory_tpu.algo.running_mean_std import (
    obs_rms_init,
    obs_rms_normalize,
    obs_rms_update,
    rms_denormalize,
    rms_init,
    rms_normalize,
    rms_update,
)
from sample_factory_tpu.envs.spaces import Box, make_dict_spec


def test_rms_converges_to_batch_stats():
    rng = np.random.default_rng(0)
    data = (rng.normal(size=(100, 64, 5)) * 3.0 + 7.0).astype(np.float32)
    state = rms_init((5,))
    for batch in data:
        state = rms_update(state, jnp.asarray(batch))
    all_data = data.reshape(-1, 5)
    np.testing.assert_allclose(np.asarray(state.running_mean), all_data.mean(0), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(state.running_var), all_data.var(0), rtol=2e-2)


def test_rms_normalize_denormalize_roundtrip():
    state = rms_init((3,))
    state = rms_update(state, jnp.asarray(np.random.default_rng(1).normal(size=(1000, 3)).astype(np.float32) * 2 + 1))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(16, 3)).astype(np.float32))
    normalized = rms_normalize(state, x)
    restored = rms_denormalize(state, normalized)
    # roundtrip is exact when values are inside the clip range
    np.testing.assert_allclose(np.asarray(restored), np.asarray(x), rtol=1e-4, atol=1e-4)


def test_rms_normalized_output_is_standardized():
    rng = np.random.default_rng(3)
    data = (rng.normal(size=(200, 128, 4)) * 5 - 2).astype(np.float32)
    state = rms_init((4,))
    for batch in data:
        state = rms_update(state, jnp.asarray(batch))
    normalized = np.asarray(rms_normalize(state, jnp.asarray(data.reshape(-1, 4))))
    np.testing.assert_allclose(normalized.mean(0), 0.0, atol=0.05)
    np.testing.assert_allclose(normalized.std(0), 1.0, atol=0.05)


def test_rms_clip():
    state = rms_init((2,), clip=5.0)
    x = jnp.asarray(np.array([[1000.0, -1000.0]], dtype=np.float32))
    out = np.asarray(rms_normalize(state, x))
    assert (np.abs(out) <= 5.0).all()


def test_rms_per_channel_image():
    rng = np.random.default_rng(4)
    imgs = rng.normal(size=(32, 8, 8, 3)).astype(np.float32) * 2 + 1
    state = rms_init((8, 8, 3), per_channel=True)
    state = rms_update(state, jnp.asarray(imgs))
    assert state.running_mean.shape == (3,)
    np.testing.assert_allclose(np.asarray(state.running_mean), imgs.mean(axis=(0, 1, 2)), rtol=0.2, atol=0.2)
    out = rms_normalize(state, jnp.asarray(imgs))
    assert out.shape == imgs.shape


def test_obs_rms_dict():
    space = make_dict_spec({"obs": Box((6,)), "measurements": Box((2,))})
    state = obs_rms_init(space, keys_to_normalize=["obs"])
    assert set(state.keys()) == {"obs"}
    obs = {
        "obs": jnp.asarray(np.random.default_rng(5).normal(size=(32, 6)).astype(np.float32)),
        "measurements": jnp.ones((32, 2), jnp.float32),
    }
    state = obs_rms_update(state, obs)
    normalized = obs_rms_normalize(state, obs)
    assert set(normalized.keys()) == {"obs", "measurements"}
    np.testing.assert_allclose(np.asarray(normalized["measurements"]), 1.0)  # untouched


def test_rms_update_masked():
    """Masked update == unmasked update on only the valid rows (mixed-policy
    self-play: invalid slots must not dilute the stats), and an all-masked
    batch leaves the state bit-identical."""
    rng = np.random.default_rng(7)
    x = rng.normal(3.0, 2.0, size=(64, 1)).astype(np.float32)
    mask = (rng.random(64) < 0.5).astype(np.float32)

    s_masked = rms_update(rms_init((1,)), jnp.asarray(x), mask=jnp.asarray(mask))
    s_subset = rms_update(rms_init((1,)), jnp.asarray(x[mask > 0]))
    np.testing.assert_allclose(np.asarray(s_masked.running_mean), np.asarray(s_subset.running_mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_masked.running_var), np.asarray(s_subset.running_var), rtol=1e-5)
    np.testing.assert_allclose(float(s_masked.count), float(s_subset.count))

    before = rms_update(rms_init((1,)), jnp.asarray(x))
    after = rms_update(before, jnp.asarray(x), mask=jnp.zeros(64))
    np.testing.assert_array_equal(np.asarray(after.running_mean), np.asarray(before.running_mean))
    np.testing.assert_array_equal(np.asarray(after.running_var), np.asarray(before.running_var))
    np.testing.assert_array_equal(np.asarray(after.count), np.asarray(before.count))


def test_rms_update_masked_per_channel():
    """Mask over the batch dim composes with per-channel (image) stats."""
    rng = np.random.default_rng(8)
    imgs = rng.normal(0.5, 0.1, size=(16, 4, 4, 3)).astype(np.float32)
    mask = np.array([1.0] * 8 + [0.0] * 8, np.float32)
    s_masked = rms_update(rms_init((4, 4, 3), per_channel=True), jnp.asarray(imgs), mask=jnp.asarray(mask))
    s_subset = rms_update(rms_init((4, 4, 3), per_channel=True), jnp.asarray(imgs[:8]))
    np.testing.assert_allclose(np.asarray(s_masked.running_mean), np.asarray(s_subset.running_mean), rtol=1e-5)
    np.testing.assert_allclose(float(s_masked.count), float(s_subset.count))


def test_rms_f32_long_horizon_drift():
    """Quantify the documented f32-vs-f64 deviation (reference keeps f64
    accumulators, running_mean_std.py:49-62; ours are f32 for TPU speed) in
    the billion-sample regime: starting from count=1e9, stream 2000 further
    batches through the f32 merge and compare against an f64 oracle of the
    SAME merge formula. The f32 path must track the oracle's mean/std to
    <0.5% relative — i.e. the f32 deviation is far below the statistical
    noise any policy would see."""
    import jax

    rng = np.random.default_rng(42)
    state = rms_init((8,))
    # pretend 1e9 samples with mean 3, var 4 have been absorbed
    state = state.replace(
        running_mean=jnp.full((8,), 3.0),
        running_var=jnp.full((8,), 4.0),
        count=jnp.asarray(1e9, jnp.float32),
    )
    mean64 = np.full((8,), 3.0, np.float64)
    var64 = np.full((8,), 4.0, np.float64)
    count64 = 1e9

    upd = jax.jit(rms_update)
    for _ in range(2000):
        x = rng.normal(3.5, 2.5, size=(1024, 8)).astype(np.float32)
        state = upd(state, jnp.asarray(x))
        # f64 oracle, same parallel-moments merge
        bm = x.astype(np.float64).mean(0)
        bv = x.astype(np.float64).var(0)
        bc = x.shape[0]
        delta = bm - mean64
        tot = count64 + bc
        mean64 = mean64 + delta * bc / tot
        m2 = var64 * count64 + bv * bc + delta**2 * count64 * bc / tot
        var64 = m2 / tot
        count64 = tot

    got_mean = np.asarray(state.running_mean, np.float64)
    got_std = np.sqrt(np.asarray(state.running_var, np.float64))
    np.testing.assert_allclose(got_mean, mean64, rtol=5e-3)
    np.testing.assert_allclose(got_std, np.sqrt(var64), rtol=5e-3)
    # count tracks exactly at this magnitude (f32 spacing at 1e9 is 64 < 1024)
    assert abs(float(state.count) - count64) / count64 < 1e-6
