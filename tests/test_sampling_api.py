"""Library sampling APIs + action masking end to end."""

import numpy as np
import pytest

import jax

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.algo.sampling_api import SyncSamplingAPI
from sf_examples_tpu.train_synthetic import parse_custom_args, register_synthetic_components


@pytest.fixture(autouse=True)
def _fresh_context():
    reset_global_context()
    register_synthetic_components()
    yield
    reset_global_context()


def _cfg(env, extra=None):
    argv = [
        f"--env={env}",
        "--experiment=api_test",
        "--seed=4",
        "--device=cpu",
        "--num_workers=2",
        "--num_envs_per_worker=8",
        "--rollout=8",
        "--batch_size=64",
        "--use_rnn=False",
        "--encoder_mlp_layers", "32",
    ] + (extra or [])
    return parse_custom_args(argv)


def test_sync_sampling_api_device_env():
    cfg = _cfg("synthetic_vector_discrete")
    api = SyncSamplingAPI(cfg)
    api.start()
    traj = api.get_trajectories_sync()
    assert traj["rewards"].shape == (8, 16)
    assert traj["obs"]["obs"].shape == (9, 16, 8)  # T+1
    assert traj["actions"].shape == (8, 16, 1)
    assert np.asarray(traj["policy_version"]).max() == 0
    # second batch continues from the same env state
    traj2 = api.get_trajectories_sync()
    assert not np.allclose(np.asarray(traj["obs"]["obs"]), np.asarray(traj2["obs"]["obs"]))
    api.stop()


def test_masked_env_actions_respect_mask():
    cfg = _cfg("synthetic_masked")
    api = SyncSamplingAPI(cfg)
    api.start()
    traj = api.get_trajectories_sync()
    obs_mask = np.asarray(traj["obs"]["action_mask"][:-1])  # [T, N, A]
    actions = np.asarray(traj["actions"])[..., 0]  # [T, N]
    # every taken action must be allowed by the mask at that step
    taken_mask = np.take_along_axis(obs_mask, actions[..., None], axis=-1)[..., 0]
    assert (taken_mask > 0).all(), "sampled a masked action"
    api.stop()


def test_sync_sampling_api_host_env(tmp_path):
    import functools

    gym = pytest.importorskip("gymnasium")
    from sf_examples_tpu.train_gym_env import parse_gym_args, register_gym_env

    argv = [
        "--env=CartPole-v1",
        "--experiment=api_host",
        f"--train_dir={tmp_path}",
        "--seed=4",
        "--device=cpu",
        "--num_workers=2",
        "--num_envs_per_worker=4",
        "--worker_num_splits=2",
        "--rollout=8",
        "--batch_size=64",
        "--use_rnn=False",
        "--serial_mode=True",
    ]
    cfg = parse_gym_args(argv)
    register_fn = functools.partial(register_gym_env, "CartPole-v1")
    register_fn()
    api = SyncSamplingAPI(cfg, register_fn=register_fn)
    api.start()
    traj = api.get_trajectories_sync()
    assert traj["rewards"].shape == (8, 8)
    assert traj["obs"]["obs"].shape == (9, 8, 4)
    api.stop()
