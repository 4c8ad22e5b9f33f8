"""Custom PIXEL env + custom model through the real host pipeline.

Modeled on reference `sf_examples/train_custom_env_custom_model.py:30-75`
(the 10x10-pixel CustomEnv that tests/examples/test_example.py trains to a
reward threshold) — upgraded to a task that actually requires READING the
pixels: each step one quadrant of a 42x42x4 uint8 screen lights up and the
agent is rewarded only for naming the lit quadrant (random policy 0.25/step,
perfect 1.0/step). A constant-objective task like the reference's would be
learnable with a blind policy; this one fails unless the conv encoder sees
real observations arrive intact through worker processes -> SharedMemory
slabs -> uint8 upload -> jitted inference -> quantized async learner.

Also demonstrates the custom-model hook: a user-registered conv encoder via
`global_model_factory().register_encoder_factory` (reference
model_factory.py:31-60).

Usage (also the committed evidence run, docs/evidence/pixel_host_300k):
    python -m sf_examples_tpu.train_custom_env_custom_model \
        --env=my_custom_pixel_env --experiment=pixel --device=cpu \
        --num_workers=2 --num_envs_per_worker=32 --train_for_env_steps=300000
"""

from __future__ import annotations

import sys
from typing import Optional

import numpy as np

import flax.linen as nn
import jax.numpy as jnp

from sample_factory_tpu.algo.context import global_model_factory
from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
from sample_factory_tpu.envs.env_utils import register_env
from sample_factory_tpu.train import run_rl

RES = 42
STACK = 4
EPISODE_LEN = 128


class CustomPixelEnv:
    """Batched host vector env (envpool-style: one object stepping N envs).

    Quadrant task: quadrant q in {0..3} is lit (255) each step; reward 1.0
    for action == q else 0. Episode = 128 steps, so returns range 32 (random)
    to 128 (perfect).
    """

    is_batched_vector_env = True
    gymnasium_api = True

    def __init__(self, num_envs: int, seed: int = 0):
        import gymnasium as gym

        self.num_envs = num_envs
        self.observation_space = gym.spaces.Box(0, 255, (RES, RES, STACK), dtype=np.uint8)
        self.action_space = gym.spaces.Discrete(4)
        self.rng = np.random.default_rng(seed)
        self.t = np.zeros(num_envs, np.int64)
        self.quadrant = np.zeros(num_envs, np.int64)

    def _obs(self) -> np.ndarray:
        obs = self.rng.integers(0, 32, (self.num_envs, RES, RES, STACK), dtype=np.uint8)  # noise floor
        h = RES // 2
        for i in range(self.num_envs):
            q = self.quadrant[i]
            r0, c0 = (q // 2) * h, (q % 2) * h
            obs[i, r0 : r0 + h, c0 : c0 + h, :] = 255
        return obs

    def reset(self, seed: Optional[int] = None):
        if seed is not None:
            self.rng = np.random.default_rng(seed)
        self.t[:] = 0
        self.quadrant = self.rng.integers(0, 4, self.num_envs)
        return self._obs(), {}

    def step(self, actions):
        actions = np.asarray(actions).reshape(self.num_envs)
        rewards = (actions == self.quadrant).astype(np.float32)
        self.t += 1
        terminated = np.zeros(self.num_envs, bool)
        truncated = self.t >= EPISODE_LEN
        self.t[truncated] = 0
        self.quadrant = self.rng.integers(0, 4, self.num_envs)
        return self._obs(), rewards, terminated, truncated, {}

    def close(self):
        pass


def make_custom_pixel_env(env_name: str, cfg=None, env_config=None, render_mode: Optional[str] = None):
    num_envs = 1
    if env_config is not None and getattr(env_config, "num_envs", None):
        num_envs = int(env_config.num_envs)
    seed = (getattr(cfg, "seed", 0) or 0) if cfg is not None else 0
    seed += int(getattr(cfg, "env_seed_offset", 0) or 0) if cfg is not None else 0
    if env_config is not None:
        seed = seed * 1000 + int(getattr(env_config, "env_id", 0) or 0)
    return CustomPixelEnv(num_envs, seed=seed)


class CustomPixelEncoder(nn.Module):
    """User-supplied encoder (the custom-model hook): 3 small convs + dense."""

    out_size: int = 128
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, obs_dict):
        x = obs_dict["obs"].astype(self.dtype)
        for features, kernel, stride in ((16, 8, 4), (32, 4, 2), (32, 3, 2)):
            x = nn.Conv(features, (kernel, kernel), strides=(stride, stride), dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(self.out_size, dtype=self.dtype)(x))
        return x

    def get_out_size(self) -> int:
        return self.out_size


def register_custom_components() -> None:
    register_env("my_custom_pixel_env", make_custom_pixel_env)
    global_model_factory().register_encoder_factory(lambda cfg, obs_space: CustomPixelEncoder())


def parse_custom_args(argv=None, evaluation: bool = False):
    parser, partial_cfg = parse_sf_args(argv=argv, evaluation=evaluation)
    parser.set_defaults(
        batched_sampling=True,
        num_workers=2,
        num_envs_per_worker=32,
        worker_num_splits=2,
        rollout=32,
        batch_size=1024,
        num_epochs=1,
        async_rl=True,
        use_rnn=False,
        normalize_input=True,
        train_for_env_steps=300000,
    )
    return parse_full_cfg(parser, argv)


def main() -> int:
    register_custom_components()
    cfg = parse_custom_args()
    return run_rl(cfg, register_fn=register_custom_components)


if __name__ == "__main__":
    sys.exit(main())
