"""QuantizedTrainer semantic parity with the fused train step.

The async host regime trains through minibatch-sized quanta
(algo/quantized_train.py); these tests pin its semantics to the fused path
(`make_train_fn`): epoch early-stop on a policy-loss plateau (reference
learner.py:676,827-837) and shuffled minibatches via segment-permutation
gather (reference learner.py uses a torch randperm; fused path
learning.py:351-358)."""

import numpy as np
import pytest

import jax

from sample_factory_tpu.algo.learning import init_train_state, make_train_fn
from sample_factory_tpu.algo.optimizers import make_optimizer
from sample_factory_tpu.algo.quantized_train import QuantizedTrainer
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
    ss, traj, _ = jax.jit(rollout, static_argnums=(4,))(ts.params, ts.obs_rms, ss, ts.train_step, 0)
    return cfg, env_info, model, tx, ts, traj, k3


def _run_quantized(cfg, env_info, model, tx, ts, traj, key):
    q = QuantizedTrainer(cfg, env_info, model, tx, 0, num_envs=cfg.num_envs)
    q.enqueue(ts, traj, key)
    while q.dispatch_one():
        pass
    ts_out, stats = q.flush()
    return q, ts_out, stats


def test_quantized_early_stop_matches_fused():
    """lr=0 freezes the params, so every epoch's mean policy loss is identical:
    the fused path stops after 2 epochs (test_early_stopping_on_plateau) and
    the quantized scheduler must drop the same quanta."""
    frozen = ["--num_epochs=4", "--learning_rate=0.0", "--lr_schedule=constant"]
    cfg, env_info, model, tx, ts, traj, key = _setup(extra=frozen)

    train = make_train_fn(cfg, env_info, model, tx, 0)
    _, fused_stats = jax.jit(train)(ts, traj, key)
    assert int(fused_stats["epochs_executed"]) == 2

    q, _, stats = _run_quantized(cfg, env_info, model, tx, ts, traj, key)
    assert int(stats["epochs_executed"]) == 2
    assert q.last_sgd_steps_executed == 2 * q.num_minibatches
    assert q.last_skipped_sgd_steps == 2 * q.num_minibatches


def test_quantized_runs_all_epochs_when_learning():
    cfg, env_info, model, tx, ts, traj, key = _setup(extra=["--num_epochs=3", "--learning_rate=0.01"])
    q, ts_out, stats = _run_quantized(cfg, env_info, model, tx, ts, traj, key)
    assert int(stats["epochs_executed"]) == 3
    assert q.last_skipped_sgd_steps == 0
    assert np.isfinite(float(jax.device_get(stats["loss"])))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts_out.params))
    )
    assert changed


def test_quantized_shuffle_minibatches():
    """--shuffle_minibatches trains through a per-epoch permutation-gather
    quantum (previously the async path silently fell back to the fused step)."""
    cfg, env_info, model, tx, ts, traj, key = _setup(
        extra=["--num_epochs=2", "--learning_rate=0.01", "--shuffle_minibatches=True"]
    )
    q, ts_out, stats = _run_quantized(cfg, env_info, model, tx, ts, traj, key)
    assert q.shuffle
    assert int(stats["epochs_executed"]) == 2
    assert q.last_sgd_steps_executed == 2 * q.num_minibatches
    assert np.isfinite(float(jax.device_get(stats["loss"])))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts_out.params))
    )
    assert changed


def test_quantized_train_step_advances_per_sgd():
    """Host-side version mirroring: device train_step advances exactly
    last_sgd_steps_executed per train step (the runner's _version_host
    contract, including the early-stop correction)."""
    cfg, env_info, model, tx, ts, traj, key = _setup(extra=["--num_epochs=2", "--learning_rate=0.01"])
    q, ts_out, _ = _run_quantized(cfg, env_info, model, tx, ts, traj, key)
    t0 = int(jax.device_get(ts.train_step))
    t1 = int(jax.device_get(ts_out.train_step))
    assert t1 - t0 == q.last_sgd_steps_executed == q.sgd_steps_per_train
