"""episode_extra_stats plumbing: env info dict -> host sampler -> runner
handlers -> AlgoObserver.extra_summaries (the reference's custom-summaries
channel used by e.g. DMLab-30 human-normalized scoring:
sf_examples/dmlab/dmlab_env.py:171-267)."""

import functools

import pytest

gym = pytest.importorskip("gymnasium")

import numpy as np

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.envs.env_utils import register_env
from sample_factory_tpu.runner.host_runner import HostEnvRunner
from sample_factory_tpu.runner.runner import AlgoObserver
from sf_examples_tpu.train_gym_env import parse_gym_args


@pytest.fixture(autouse=True)
def _fresh_context():
    reset_global_context()
    yield
    reset_global_context()


class ExtraStatsEnv(gym.Env):
    """Tiny episodic env that reports a custom per-episode stat in the final info."""

    def __init__(self):
        self.observation_space = gym.spaces.Box(-1, 1, (4,), np.float32)
        self.action_space = gym.spaces.Discrete(2)
        self.t = 0
        self.episodes = 0

    def reset(self, *, seed=None, options=None):
        self.t = 0
        return self.observation_space.sample(), {}

    def step(self, action):
        self.t += 1
        done = self.t >= 9
        info = {}
        if done:
            self.episodes += 1
            info["episode_extra_stats"] = {"z_00_custom_raw_score": float(self.episodes), "z_00_custom_len": self.t}
        return self.observation_space.sample(), 1.0, done, False, info


def _make_env(_name, _cfg, _env_config, render_mode=None):
    return ExtraStatsEnv()


def register_extra_stats_env():
    register_env("extra_stats_env", _make_env)


class CollectingObserver(AlgoObserver):
    def __init__(self):
        self.summaries_calls = 0

    def extra_summaries(self, runner, policy_id, writer, env_steps):
        self.summaries_calls += 1
        writer.add_scalar("_custom/marker", 1.0, env_steps)


def test_extra_stats_flow(tmp_path):
    argv = [
        "--env=extra_stats_env",
        "--experiment=extras",
        f"--train_dir={tmp_path}",
        "--seed=3",
        "--device=cpu",
        "--num_workers=1",
        "--num_envs_per_worker=4",
        "--worker_num_splits=1",
        "--rollout=16",
        "--batch_size=64",
        "--train_for_env_steps=640",
        "--serial_mode=True",
        "--use_rnn=False",
        "--experiment_summaries_interval=0",
        "--encoder_mlp_layers", "16",
    ]
    cfg = parse_gym_args(argv)
    register_fn = functools.partial(register_extra_stats_env)
    register_fn()

    runner = HostEnvRunner(cfg, register_fn=register_fn)
    seen = []
    runner.register_episodic_stats_handler(lambda r, extras, pid: seen.append((dict(extras), pid)))
    observer = CollectingObserver()
    runner.register_observer(observer)
    runner.init()
    status = runner.run()
    assert status == 0

    # 640 steps / 9-step episodes across 4 envs -> dozens of completed episodes
    assert len(seen) >= 10, f"extra stats did not flow: {len(seen)}"
    extras, pid = seen[0]
    assert pid == 0
    assert "z_00_custom_raw_score" in extras and extras["z_00_custom_len"] == 9
    assert observer.summaries_calls >= 1, "AlgoObserver.extra_summaries never invoked"
