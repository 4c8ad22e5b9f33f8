"""Host (gymnasium) env wrappers and creation.

Parity: reference `sample_factory/envs/env_wrappers.py` (pixel format, resize,
frameskip, episode counters) and `sample_factory/algo/utils/make_env.py`
(dict-obs normalization, gym<->gymnasium shims, vectorization). TPU-native
differences: observations are kept HWC uint8 on the host (XLA-native layout;
the reference converts to CHW for torch, make_env.py:37-56) and the vector
dimension is assembled by the host sampler, not nested wrapper stacks.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

try:
    import gymnasium as gym
except ImportError:  # pragma: no cover
    gym = None

from sample_factory_tpu.utils.utils import log


class DictObservationWrapper(gym.ObservationWrapper if gym else object):
    """Wrap a non-dict observation space into {'obs': ...} (reference make_env.py:59-77)."""

    def __init__(self, env):
        super().__init__(env)
        self.observation_space = gym.spaces.Dict({"obs": env.observation_space})

    def observation(self, obs):
        return {"obs": obs}


class ImageToHWC(gym.ObservationWrapper if gym else object):
    """Ensure image observations are channel-last (TPU-native)."""

    def __init__(self, env):
        super().__init__(env)
        old = env.observation_space
        assert isinstance(old, gym.spaces.Box) and len(old.shape) == 3
        if old.shape[0] <= 4 and old.shape[0] < old.shape[-1]:
            # CHW -> HWC
            self._transpose = True
            new_shape = (old.shape[1], old.shape[2], old.shape[0])
            self.observation_space = gym.spaces.Box(
                low=old.low.min(), high=old.high.max(), shape=new_shape, dtype=old.dtype
            )
        else:
            self._transpose = False
            self.observation_space = old

    def observation(self, obs):
        return np.transpose(obs, (1, 2, 0)) if self._transpose else obs


class FrameskipWrapper(gym.Wrapper if gym else object):
    """Action repeat with reward accumulation (reference env_wrappers.py SkipFramesWrapper)."""

    def __init__(self, env, skip: int):
        super().__init__(env)
        self.skip = skip

    def step(self, action):
        total_reward = 0.0
        obs = reward = terminated = truncated = info = None
        for _ in range(self.skip):
            obs, reward, terminated, truncated, info = self.env.step(action)
            total_reward += reward
            if terminated or truncated:
                break
        return obs, total_reward, terminated, truncated, info


class EpisodeCounterWrapper(gym.Wrapper if gym else object):
    def __init__(self, env):
        super().__init__(env)
        self.episode_count = 0

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        if terminated or truncated:
            self.episode_count += 1
        return obs, reward, terminated, truncated, info


def wrap_host_env(env, cfg):
    """Standard wrapper stack for host envs (reference create_env + make_env)."""
    if cfg is not None and cfg.env_frameskip > 1 and not getattr(env, "_sf_handles_frameskip", False):
        env = FrameskipWrapper(env, cfg.env_frameskip)
    if isinstance(env.observation_space, gym.spaces.Box) and len(env.observation_space.shape) == 3:
        env = ImageToHWC(env)
    if cfg is not None and cfg.use_record_episode_statistics:
        env = gym.wrappers.RecordEpisodeStatistics(env)
    if cfg is not None and cfg.episode_counter:
        env = EpisodeCounterWrapper(env)
    if not isinstance(env.observation_space, gym.spaces.Dict):
        env = DictObservationWrapper(env)
    return env
