"""envpool Atari entry point driven end-to-end with a fake C++ pool.

Covers the reference's envpool integration surface
(`sf_examples/envpool/atari/train_envpool_atari.py`): env registration,
NoFrameskip-v4 -> -v5 task-id mapping, the CHW->HWC transpose at the adapter
boundary, envpool's auto-reset fix (terminal obs at done must be replaced by
the next episode's first obs — reference envpool_wrappers.py:28-38), and a
full run_rl training pass through the batched host vector-env contract.
"""

import glob
import sys
import types
from os.path import join

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")


class FakeAtariPool:
    """CHW uint8 pool with envpool's auto-reset semantics: obs at done is the
    TERMINAL frame; reset(env_ids) starts the next episode."""

    def __init__(self, num_envs, max_episode_steps=8):
        self.num_envs = num_envs
        self.observation_space = gym.spaces.Box(0, 255, (4, 84, 84), dtype=np.uint8)
        self.action_space = gym.spaces.Discrete(6)
        self.t = np.zeros(num_envs, np.int64)
        self.limit = max_episode_steps

    def _obs(self):
        # frame value = per-env step counter (terminal frame = self.limit)
        return np.broadcast_to(
            (self.t % 256).astype(np.uint8)[:, None, None, None], (self.num_envs, 4, 84, 84)
        ).copy()

    def reset(self, env_ids=None):
        if env_ids is None:
            self.t[:] = 0
        else:
            self.t[np.asarray(env_ids)] = 0
        obs = self._obs()
        if env_ids is not None:
            obs = obs[np.asarray(env_ids)]
        return obs, {}

    def step(self, actions):
        assert actions.shape[0] == self.num_envs
        self.t += 1
        terminated = self.t >= self.limit
        obs = self._obs()  # terminal obs for done envs (envpool behavior)
        rewards = np.where(actions == 1, 1.0, 0.0).astype(np.float32)
        # envpool would reset on the NEXT step; the adapter must not wait
        return obs, rewards, terminated, np.zeros(self.num_envs, bool), {}

    def close(self):
        pass


@pytest.fixture()
def fake_envpool(monkeypatch):
    made = {}

    fake = types.ModuleType("envpool")

    def make(task_id, env_type, num_envs, seed, **kwargs):
        assert env_type == "gymnasium"
        made["task_id"] = task_id
        made["kwargs"] = kwargs
        pool = FakeAtariPool(num_envs, max_episode_steps=kwargs.get("max_episode_steps", 8))
        made["pool"] = pool
        return pool

    fake.make = make
    monkeypatch.setitem(sys.modules, "envpool", fake)
    return made


def test_task_id_mapping_and_transpose(fake_envpool):
    from sample_factory_tpu.utils.attr_dict import AttrDict
    from sf_examples_tpu.envpool.train_envpool_atari import make_envpool_atari_env

    env = make_envpool_atari_env(
        "envpool_atari_breakout", cfg=None, env_config=AttrDict(num_envs=4, env_id=0)
    )
    assert fake_envpool["task_id"] == "Breakout-v5"  # NoFrameskip-v4 -> -v5
    assert env.observation_space.shape == (84, 84, 4)  # CHW -> HWC
    obs, info = env.reset()
    assert obs.shape == (4, 84, 84, 4) and obs.dtype == np.uint8


def test_montezuma_timeout_halved_for_frameskip(fake_envpool):
    from sample_factory_tpu.utils.attr_dict import AttrDict
    from sf_examples_tpu.envpool.train_envpool_atari import make_envpool_atari_env

    make_envpool_atari_env("envpool_atari_montezuma", cfg=None, env_config=AttrDict(num_envs=2, env_id=0))
    assert fake_envpool["kwargs"]["max_episode_steps"] == 18000 // 4


def test_auto_reset_fix(fake_envpool):
    """At done, the adapter must deliver the NEXT episode's first obs, not the
    terminal frame (the reference's EnvPoolResetFixWrapper semantics)."""
    from sample_factory_tpu.utils.attr_dict import AttrDict
    from sf_examples_tpu.envpool.train_envpool_atari import make_envpool_atari_env

    env = make_envpool_atari_env(
        "envpool_atari_pong", cfg=None, env_config=AttrDict(num_envs=3, env_id=0)
    )
    env.reset()
    for step in range(1, 9):
        obs, r, term, trunc, info = env.step(np.zeros(3, np.int64))
        if step < 8:
            assert not term.any() and (obs == step).all()
    assert term.all()
    # terminal frame would be 8; the fix must hand out the reset frame (0)
    assert (obs == 0).all(), f"terminal obs leaked through auto-reset: {obs[0,0,0,0]}"


def test_envpool_atari_e2e_training(fake_envpool, tmp_path):
    """Full run_rl pass: envpool_atari_* env through the batched host
    contract in serial mode (the fake pool lives in this process)."""
    from sample_factory_tpu.algo.context import reset_global_context
    from sample_factory_tpu.train import run_rl
    from sf_examples_tpu.envpool.train_envpool_atari import (
        parse_envpool_atari_args,
        register_envpool_atari_components,
    )

    reset_global_context()
    register_envpool_atari_components()
    argv = [
        "--env=envpool_atari_pong",
        "--experiment=ep_atari",
        f"--train_dir={tmp_path}",
        "--device=cpu",
        "--serial_mode=True",
        "--num_workers=1",
        "--num_envs_per_worker=4",
        "--worker_num_splits=2",
        "--rollout=8",
        "--batch_size=32",
        "--num_batches_per_epoch=1",
        "--num_epochs=1",
        "--use_rnn=False",
        "--encoder_conv_architecture=convnet_simple",
        "--encoder_conv_mlp_layers", "32",
        "--train_for_env_steps=1024",
        "--experiment_summaries_interval=1",
        "--save_every_sec=10000",
        "--decorrelate_envs_on_one_worker=False",
    ]
    cfg = parse_envpool_atari_args(argv)
    assert run_rl(cfg, register_fn=register_envpool_atari_components) == 0
    assert glob.glob(join(str(tmp_path), "ep_atari", "checkpoint_p0", "*.msgpack"))
    reset_global_context()
