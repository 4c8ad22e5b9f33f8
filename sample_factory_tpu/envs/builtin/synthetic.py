"""Synthetic test environments for end-to-end learning tests.

Modeled on the reference's test env (`sf_examples/train_custom_env_custom_model.py:30-75`:
10x10x1 random-pixel obs, reward = action_index * coeff, fixed episode length)
— the harness that exercises runner/sampler/learner/checkpointing at once
(reference tests/examples/test_example.py). Implemented as jittable DeviceEnvs;
a continuous twin covers Gaussian policies, and a multi-agent variant covers
the multi-policy path.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sample_factory_tpu.envs.device_env import DeviceEnv
from sample_factory_tpu.envs.spaces import Box, Discrete, TupleSpec, make_dict_spec


class SyntheticDiscreteEnv(DeviceEnv):
    """Pick the biggest action index -> biggest reward. Pixel observations."""

    def __init__(self, num_actions: int = 10, episode_len: int = 16, res: int = 10, action_rew_coeff: float = 0.01):
        self.num_actions = num_actions
        self.episode_len = episode_len
        self.res = res
        self.reward_shaping = {"action_rew_coeff": action_rew_coeff}
        # HWC layout (TPU-native); the reference uses CHW for torch
        self.obs_space = make_dict_spec({"obs": Box((res, res, 1), 0.0, 1.0)})
        self.action_space = Discrete(num_actions)

    def update_reward_shaping(self, reward_shaping):
        return SyntheticDiscreteEnv(
            self.num_actions, self.episode_len, self.res, reward_shaping["action_rew_coeff"]
        )

    def _obs(self, key):
        return {"obs": jax.random.uniform(key, (self.res, self.res, 1))}

    def reset(self, key):
        return self._obs(key), {"steps": jnp.zeros((), jnp.int32), "key": key}

    def step(self, key, state, action):
        a = action[..., 0].astype(jnp.float32) if action.ndim > 0 else action.astype(jnp.float32)
        reward = a * self.reward_shaping["action_rew_coeff"]
        steps = state["steps"] + 1
        terminated = steps >= self.episode_len
        truncated = jnp.zeros((), bool)
        return self._obs(key), {"steps": steps, "key": key}, reward.astype(jnp.float32), terminated, truncated, {}


class SyntheticVectorDiscreteEnv(SyntheticDiscreteEnv):
    """Same objective, flat vector observations (fast; exercises MLP encoder)."""

    def __init__(self, num_actions: int = 10, episode_len: int = 16, dim: int = 8, action_rew_coeff: float = 0.01):
        super().__init__(num_actions, episode_len, res=1, action_rew_coeff=action_rew_coeff)
        self.dim = dim
        self.obs_space = make_dict_spec({"obs": Box((dim,), 0.0, 1.0)})

    def _obs(self, key):
        return {"obs": jax.random.uniform(key, (self.dim,))}


class SyntheticContinuousEnv(DeviceEnv):
    """Reward = -||action - target||^2; tests Gaussian policies end to end."""

    def __init__(self, dim: int = 2, episode_len: int = 16, target: float = 0.4):
        self.dim = dim
        self.episode_len = episode_len
        self.target = target
        self.obs_space = make_dict_spec({"obs": Box((4,), 0.0, 1.0)})
        self.action_space = Box((dim,), -1.0, 1.0)

    def _obs(self, key):
        return {"obs": jax.random.uniform(key, (4,))}

    def reset(self, key):
        return self._obs(key), {"steps": jnp.zeros((), jnp.int32)}

    def step(self, key, state, action):
        reward = -jnp.sum(jnp.square(action - self.target))
        steps = state["steps"] + 1
        terminated = steps >= self.episode_len
        truncated = jnp.zeros((), bool)
        return self._obs(key), {"steps": steps}, reward.astype(jnp.float32), terminated, truncated, {}


class SyntheticTupleActionEnv(DeviceEnv):
    """Hybrid action space (Discrete + Box): exercises TupleDistribution end to end."""

    def __init__(self, episode_len: int = 16):
        self.episode_len = episode_len
        self.obs_space = make_dict_spec({"obs": Box((4,), 0.0, 1.0)})
        self.action_space = TupleSpec((Discrete(3), Box((2,), -1.0, 1.0)))

    def _obs(self, key):
        return {"obs": jax.random.uniform(key, (4,))}

    def reset(self, key):
        return self._obs(key), {"steps": jnp.zeros((), jnp.int32)}

    def step(self, key, state, action):
        # reward for picking discrete action 2 and continuous actions near 0.5
        disc = action[..., 0]
        cont = action[..., 1:]
        reward = 0.1 * disc - jnp.sum(jnp.square(cont - 0.5))
        steps = state["steps"] + 1
        terminated = steps >= self.episode_len
        truncated = jnp.zeros((), bool)
        return self._obs(key), {"steps": steps}, reward.astype(jnp.float32), terminated, truncated, {}


class SyntheticMaskedEnv(SyntheticVectorDiscreteEnv):
    """Discrete env with action masking: the top action is masked out half the
    time, so the optimal masked policy picks the second-best. Exercises the
    action_mask path end to end."""

    def __init__(self, num_actions: int = 6, episode_len: int = 16, dim: int = 8):
        super().__init__(num_actions=num_actions, episode_len=episode_len, dim=dim)
        from sample_factory_tpu.envs.spaces import make_dict_spec

        self.obs_space = make_dict_spec(
            {"obs": Box((dim,), 0.0, 1.0), "action_mask": Box((num_actions,), 0.0, 1.0)}
        )

    def _obs(self, key):
        k1, k2 = jax.random.split(key)
        mask = jnp.ones(self.num_actions)
        top_masked = jax.random.bernoulli(k2, 0.5)
        mask = mask.at[self.num_actions - 1].set(jnp.where(top_masked, 0.0, 1.0))
        return {"obs": jax.random.uniform(k1, (self.dim,)), "action_mask": mask}


def make_synthetic_env(full_env_name: str, cfg=None, env_config=None, render_mode: Optional[str] = None):
    num_actions = getattr(cfg, "custom_env_num_actions", 10) if cfg is not None else 10
    episode_len = getattr(cfg, "custom_env_episode_len", 16) if cfg is not None else 16
    if full_env_name == "synthetic_discrete":
        return SyntheticDiscreteEnv(num_actions=num_actions, episode_len=episode_len)
    if full_env_name == "synthetic_vector_discrete":
        return SyntheticVectorDiscreteEnv(num_actions=num_actions, episode_len=episode_len)
    if full_env_name == "synthetic_continuous":
        return SyntheticContinuousEnv(episode_len=episode_len)
    if full_env_name == "synthetic_tuple":
        return SyntheticTupleActionEnv(episode_len=episode_len)
    if full_env_name == "synthetic_masked":
        return SyntheticMaskedEnv(episode_len=episode_len)
    if full_env_name == "grid_battle":
        from sample_factory_tpu.envs.builtin.grid_battle import GridBattleEnv

        return GridBattleEnv()
    if full_env_name == "grid_battle_small":
        from sample_factory_tpu.envs.builtin.grid_battle import GridBattleEnv

        return GridBattleEnv(size=12, num_enemies=4, episode_len=128, shoot_range=5)
    raise ValueError(f"Unknown synthetic env {full_env_name}")
