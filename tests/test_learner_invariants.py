"""Learner-level invariants, modeled on reference tests/algo/test_learner.py:49-168:
loss determinism and the invalid-data splice test (invalid transitions must not
change the update at all)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sample_factory_tpu.algo.learning import init_train_state, make_train_fn
from sample_factory_tpu.algo.optimizers import make_optimizer
from sample_factory_tpu.algo.sampling import init_sampler_state, make_rollout_fn
from sample_factory_tpu.cfg.arguments import default_cfg
from sample_factory_tpu.envs.builtin.synthetic import SyntheticVectorDiscreteEnv
from sample_factory_tpu.envs.env_info import extract_env_info
from sample_factory_tpu.models.actor_critic import create_actor_critic


def _setup(extra=None):
    argv = [
        "--use_rnn=True", "--rnn_size=16", "--encoder_mlp_layers", "32",
        "--rollout=8", "--recurrence=4", "--batch_size=64", "--num_epochs=1",
        "--num_workers=1", "--num_envs_per_worker=16", "--seed=3",
        "--normalize_input=True", "--normalize_returns=True",
    ] + (extra or [])
    cfg = default_cfg(env="t", argv=argv)
    env = SyntheticVectorDiscreteEnv(num_actions=4, episode_len=6)
    env_info = extract_env_info(env, cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ss = init_sampler_state(cfg, env, k1, cfg.num_envs)
    ts = init_train_state(cfg, env_info, model, tx, k2, {k: v[:2] for k, v in ss.obs.items()})
    rollout = make_rollout_fn(cfg, env, env_info, model)
    train = make_train_fn(cfg, env_info, model, tx, 0)
    ss, traj, _ = jax.jit(rollout, static_argnums=(4,))(ts.params, ts.obs_rms, ss, ts.train_step, 0)
    return cfg, ts, traj, train, k3


def test_train_is_deterministic():
    cfg, ts, traj, train, key = _setup()
    train_jit = jax.jit(train)
    ts1, stats1 = train_jit(ts, traj, key)
    ts2, stats2 = train_jit(ts, traj, key)
    np.testing.assert_allclose(float(stats1["loss"]), float(stats2["loss"]), rtol=1e-6)
    l1 = jax.tree.leaves(ts1.params)
    l2 = jax.tree.leaves(ts2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_invalid_data_does_not_change_update():
    """Add garbage transitions marked invalid (wrong policy_id) alongside the
    real data and assert losses are unchanged (reference :108-168: the valid
    set is identical, the invalid additions must be fully masked).

    Normalizers are off so garbage can't shift running stats (the reference
    test also sets normalize_input/normalize_returns False). Both runs use a
    single minibatch so stats come from the same pre-update params.
    """
    common = ["--normalize_input=False", "--normalize_returns=False"]
    cfg, ts, traj, train, key = _setup(extra=common + ["--batch_size=128"])
    stats_base = jax.jit(train)(ts, traj, key)[1]

    # independent build with batch_size=256 (same seed -> identical params/traj)
    cfg2, ts2, traj2_src, train2, key2 = _setup(extra=common + ["--batch_size=256"])
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # double the env axis: second half is garbage owned by another policy
    rng = np.random.default_rng(0)

    def splice(x):
        x = np.asarray(x)
        garbage = (rng.integers(-1, 1, size=x.shape) * 4242).astype(x.dtype)
        return jnp.asarray(np.concatenate([x, garbage], axis=1))

    traj2 = jax.tree.map(splice, jax.tree.map(np.asarray, traj2_src))
    N = np.asarray(traj["rewards"]).shape[1]
    pid = np.asarray(traj2["policy_id"]).copy()
    pid[:, N:] = -1  # inactive-agent marker -> invalid
    traj2["policy_id"] = jnp.asarray(pid)
    for k in ("dones", "time_outs"):
        arr = np.asarray(traj2[k]).copy()
        arr[:, N:] = 0.0
        traj2[k] = jnp.asarray(arr)

    stats_spliced = jax.jit(train2)(ts2, traj2, key2)[1]
    assert float(stats_spliced["valids_fraction"]) == pytest.approx(0.5, abs=1e-6)

    for k in ("policy_loss", "exploration_loss", "value_loss", "kl_divergence", "entropy"):
        np.testing.assert_allclose(
            float(stats_base[k]), float(stats_spliced[k]), rtol=2e-2, atol=2e-2, err_msg=k
        )


def test_invalid_data_gae_unchanged():
    """GAE advantages for valid envs must not be polluted by invalid envs."""
    from sample_factory_tpu.algo.advantages import gae_advantages

    rng = np.random.default_rng(0)
    T, E = 8, 6
    rewards = rng.normal(size=(T, E)).astype(np.float32)
    dones = np.zeros((T, E), np.float32)
    values = rng.normal(size=(T + 1, E)).astype(np.float32)
    valids = np.ones((T + 1, E), np.float32)

    adv1 = np.asarray(gae_advantages(jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(values), jnp.asarray(valids), 0.99, 0.95))

    rewards2, values2, valids2 = rewards.copy(), values.copy(), valids.copy()
    valids2[:, 2] = 0
    rewards2[:, 2] = 1e9
    values2[:, 2] = -1e9
    # x (deltas) must be pre-multiplied by valids per the contract; gae_advantages does this
    adv2 = np.asarray(gae_advantages(jnp.asarray(rewards2), jnp.asarray(dones), jnp.asarray(values2), jnp.asarray(valids2), 0.99, 0.95))
    valid_cols = [0, 1, 3, 4, 5]
    np.testing.assert_allclose(adv1[:, valid_cols], adv2[:, valid_cols], rtol=1e-5)


def test_vtrace_cfg_requires_recurrence_eq_rollout():
    from sample_factory_tpu.cfg.arguments import verify_cfg

    cfg = default_cfg(env="t", argv=["--with_vtrace=True", "--rollout=8", "--recurrence=4", "--use_rnn=True", "--seed=1"])
    with pytest.raises(ValueError):
        verify_cfg(cfg)


def test_lamb_optimizer_trains():
    cfg, ts, traj, train, key = _setup(extra=["--optimizer=lamb"])
    train_jit = jax.jit(train)
    ts2, stats = train_jit(ts, traj, key)
    assert np.isfinite(float(stats["loss"]))
    # params changed
    a = jax.tree.leaves(ts.params)[0]
    b = jax.tree.leaves(ts2.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_early_stopping_on_plateau():
    """Parity with reference learner.py:827-837: when the epoch-mean policy
    loss stops changing (tolerance 1e-6), remaining epochs are skipped. With
    lr=0 the params never change, so epoch 2 detects a plateau vs epoch 1 and
    epochs 3-4 are skipped."""
    frozen = ["--num_epochs=4", "--learning_rate=0.0", "--lr_schedule=constant"]
    cfg, ts, traj, train, key = _setup(extra=frozen)
    _, stats = jax.jit(train)(ts, traj, key)
    assert int(stats["epochs_executed"]) == 2, f"expected early stop after 2 epochs, got {stats['epochs_executed']}"

    # normal learning: losses move epoch to epoch, all epochs execute
    cfg, ts, traj, train, key = _setup(extra=["--num_epochs=3", "--learning_rate=0.01"])
    ts_out, stats = jax.jit(train)(ts, traj, key)
    assert int(stats["epochs_executed"]) == 3
    # and params actually changed
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts_out.params))
    )
    assert changed
