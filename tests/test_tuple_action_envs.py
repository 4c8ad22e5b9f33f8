"""Tuple action spaces end-to-end through the host pipeline.

Mirrors reference tests/envs/tuple_action_envs/* — identity envs with
(Discrete, Discrete) and mixed (Discrete, Box) tuple action spaces, trained
through both the batched and non-batched sampling paths, with an export
round-trip (the reference checks ONNX; here it is the StableHLO export).
"""

import glob
import json
from os.path import join

import gymnasium as gym
import numpy as np
import pytest

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.envs.env_utils import register_env
from sample_factory_tpu.train import run_rl


class IdentityEnvTwoDiscrete(gym.Env):
    """One-hot state; reward 1 per tuple component that identifies the state."""

    def __init__(self, size=4):
        self.size = size
        self.observation_space = gym.spaces.Box(-1, 1, shape=(size,), dtype=np.float32)
        self.action_space = gym.spaces.Tuple([gym.spaces.Discrete(size), gym.spaces.Discrete(size * 3)])
        self.ep_length = 10
        self._rng = np.random.default_rng(0)
        self.current_step = 0

    def _next_state(self):
        self.state = np.zeros(self.size, np.float32)
        self.index = int(self._rng.integers(self.size))
        self.state[self.index] = 1.0

    def reset(self, seed=None, **kwargs):
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        self.current_step = 0
        self._next_state()
        return self.state, {}

    def step(self, action):
        assert isinstance(action[0], (int, np.integer)) and isinstance(action[1], (int, np.integer))
        r = float(self.index == action[0]) + float(self.index * 3 == self.size * 3 - action[1] - 1)
        self._next_state()
        self.current_step += 1
        done = self.current_step >= self.ep_length
        return self.state, r, done, False, {}


class IdentityEnvMixed(gym.Env):
    """Mixed tuple: a Discrete identifying the state + a Box regressing it."""

    def __init__(self, size=4):
        self.size = size
        self.observation_space = gym.spaces.Box(-1, 1, shape=(size,), dtype=np.float32)
        self.action_space = gym.spaces.Tuple([gym.spaces.Discrete(size), gym.spaces.Box(-1.0, 1.0, (1,), dtype=np.float32)])
        self.ep_length = 10
        self._rng = np.random.default_rng(0)
        self.current_step = 0

    def _next_state(self):
        self.state = np.zeros(self.size, np.float32)
        self.index = int(self._rng.integers(self.size))
        self.state[self.index] = 1.0

    def reset(self, seed=None, **kwargs):
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        self.current_step = 0
        self._next_state()
        return self.state, {}

    def step(self, action):
        assert isinstance(action[0], (int, np.integer))
        cont = np.asarray(action[1], np.float32)
        assert cont.shape == (1,)
        target = 2.0 * self.index / (self.size - 1) - 1.0
        r = float(self.index == action[0]) + max(0.0, 1.0 - 2.0 * abs(float(cont[0]) - target))
        self._next_state()
        self.current_step += 1
        done = self.current_step >= self.ep_length
        return self.state, r, done, False, {}


ENVS = {
    "tuple_two_discrete": lambda name, cfg=None, env_config=None, render_mode=None: IdentityEnvTwoDiscrete(4),
    "tuple_mixed": lambda name, cfg=None, env_config=None, render_mode=None: IdentityEnvMixed(4),
}


def register_tuple_envs():
    for name, fn in ENVS.items():
        register_env(name, fn)


@pytest.mark.parametrize(
    "env_name,batched",
    [
        ("tuple_two_discrete", True),
        ("tuple_mixed", False),
        pytest.param("tuple_mixed", True, marks=pytest.mark.medium),
        pytest.param("tuple_two_discrete", False, marks=pytest.mark.medium),
    ],
    ids=["batched-tuple_two_discrete", "non_batched-tuple_mixed", "batched-tuple_mixed", "non_batched-tuple_two_discrete"],
)
def test_tuple_actions_e2e(tmp_path, env_name, batched):
    from sf_examples_tpu.train_gym_env import parse_gym_args

    reset_global_context()
    register_tuple_envs()
    argv = [
        f"--env={env_name}",
        "--experiment=tup",
        f"--train_dir={tmp_path}",
        "--seed=0",
        "--device=cpu",
        f"--batched_sampling={batched}",
        "--num_workers=2",
        "--num_envs_per_worker=8",
        "--worker_num_splits=2",
        "--rollout=16",
        "--batch_size=512",
        "--use_rnn=False",
        "--encoder_mlp_layers", "64", "64",
        "--nonlinearity=tanh",
        "--decorrelate_envs_on_one_worker=False",
        # 90k: at 60k the non-batched mixed variant's reward was still mid-climb
        # and could land within noise of the +3.0 margin (seed-trajectory
        # sensitive; the r5 per-rollout key batching shifted RNG streams)
        "--train_for_env_steps=90000",
        "--experiment_summaries_interval=2",
        "--save_every_sec=5",
    ]
    cfg = parse_gym_args(argv)
    assert run_rl(cfg, register_fn=register_tuple_envs) == 0

    jsonl = glob.glob(join(str(tmp_path), "tup", ".summary", "0", "summaries.jsonl"))[0]
    rewards = [json.loads(l)["train/reward"] for l in open(jsonl) if "train/reward" in json.loads(l)]
    # random play ~3.3 (two-discrete) / ~8 (mixed) per 10-step episode;
    # identifying the state is immediate for PPO within 60k steps
    assert max(rewards) > rewards[0] + 3.0, f"did not learn: {rewards[0]} -> {max(rewards)}"

    if env_name == "tuple_mixed" and batched:
        # export round-trip on the tuple head (reference check_export_onnx)
        import jax

        from sample_factory_tpu.export_model import export_model, load_exported_model
        from sample_factory_tpu.models.actor_critic import initial_actor_critic_state

        eval_cfg = parse_gym_args(argv, evaluation=True)
        path = export_model(eval_cfg, batch_size=2)
        exported = load_exported_model(path)
        obs = {"obs": np.zeros((2, 4), np.float32)}
        actions, _ = exported(obs, initial_actor_critic_state(eval_cfg, 2), jax.random.PRNGKey(0))
        # tuple head: 1 discrete + 1 box component = action width 2
        assert np.asarray(actions).shape == (2, 2)
    reset_global_context()
