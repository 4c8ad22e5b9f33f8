"""Failure detection: a dead env worker must surface as a clean error within
the heartbeat window (reference heartbeats: runner.py:550-619 aborts the
experiment when components go silent)."""

import functools
import time

import pytest

gym = pytest.importorskip("gymnasium")

import jax

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.algo.host_sampling import HostVectorSampler
from sample_factory_tpu.envs.env_info import obtain_env_info
from sample_factory_tpu.models.actor_critic import create_actor_critic
from sf_examples_tpu.train_gym_env import parse_gym_args, register_gym_env


def test_dead_worker_detected():
    reset_global_context()
    register_fn = functools.partial(register_gym_env, "CartPole-v1")
    register_fn()
    argv = [
        "--env=CartPole-v1",
        "--experiment=hb",
        "--seed=1",
        "--device=cpu",
        "--num_workers=2",
        "--num_envs_per_worker=4",
        "--worker_num_splits=2",
        "--rollout=8",
        "--batch_size=64",
        "--use_rnn=False",
        "--serial_mode=False",
        "--heartbeat_reporting_interval=6",
    ]
    cfg = parse_gym_args(argv)
    env_info = obtain_env_info(cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    sampler = HostVectorSampler(cfg, env_info, model, register_fn=register_fn)
    sampler.start()
    try:
        from sample_factory_tpu.algo.learning import init_train_state
        from sample_factory_tpu.algo.optimizers import make_optimizer

        key = jax.random.PRNGKey(0)
        ts = init_train_state(
            cfg, env_info, model, make_optimizer(cfg), key,
            {k: jax.numpy.asarray(v[:2]) for k, v in sampler._split_obs(0).items()},
        )
        # healthy rollout first
        traj, stats = sampler.collect_rollout(ts.params, ts.obs_rms, key, 0, 0)
        assert traj["rewards"].shape[0] == 8

        # kill one worker; the next rollout must fail loudly, not hang forever
        sampler.workers[0].kill()
        sampler.workers[0].join(timeout=5)
        t0 = time.time()
        with pytest.raises((TimeoutError, RuntimeError)):
            sampler.collect_rollout(ts.params, ts.obs_rms, key, 0, 0)
        assert time.time() - t0 < 60, "failure detection took too long"
    finally:
        sampler.close()
        reset_global_context()
