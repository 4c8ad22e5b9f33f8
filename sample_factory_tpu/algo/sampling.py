"""On-device sampler: the TPU-native replacement for RolloutWorker+InferenceWorker.

Reference architecture (being replaced, not ported): rollout worker processes
step envs and ping-pong `advance_rollouts`/`policy request` signals with
inference workers through shared-memory queues (reference
`algo/sampling/rollout_worker.py:176-259`, `inference_worker.py:313-362`).
Here the policy forward and the env step are fused into one jitted
`lax.scan` over the rollout length, `vmap`ed over all envs — no queues, no
processes, no copies: the trajectory lands in device-resident arrays shaped
[T, N, ...] exactly where the learner reads them.

The trajectory schema matches the reference's shared buffers
(`algo/utils/shared_buffers.py:67-92`): obs and rnn_states carry T+1 entries
for bootstrap, values are behavior-policy values, policy_version stamps enable
max_policy_lag masking in async mode.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from sample_factory_tpu.algo.distributions import get_action_distribution, sample_actions_log_probs
from sample_factory_tpu.algo.running_mean_std import obs_rms_normalize
from sample_factory_tpu.envs.device_env import DeviceEnv, vector_reset, vector_step
from sample_factory_tpu.envs.spaces import action_dtype, num_actions
from sample_factory_tpu.models.actor_critic import initial_actor_critic_state


@struct.dataclass
class SamplerState:
    """Carried across rollouts. All arrays lead with the env axis [N, ...]."""

    env_states: Any
    obs: Dict[str, jnp.ndarray]
    rnn_state: jnp.ndarray
    key: jnp.ndarray
    # episodic accumulators (running, not yet completed episodes)
    ep_return: jnp.ndarray  # [N]
    ep_len: jnp.ndarray  # [N]
    ep_return_raw: jnp.ndarray  # [N] before reward scaling/clipping
    # runtime reward-shaping coefficients (dict of f32 scalars) for envs with
    # supports_dynamic_shaping — PBT mutates these between iterations without
    # recompiling (the TPU-native RewardShapingInterface; reference pushes
    # shaping dicts to env processes via update_training_info)
    shaping: Any = None


def init_sampler_state(cfg, env: DeviceEnv, key, num_envs: int) -> SamplerState:
    reset_key, carry_key = jax.random.split(key)
    obs, env_states = vector_reset(env, reset_key, num_envs)
    shaping = None
    if getattr(env, "supports_dynamic_shaping", False) and env.reward_shaping:
        shaping = {k: jnp.asarray(v, jnp.float32) for k, v in env.reward_shaping.items()}
    return SamplerState(
        env_states=env_states,
        obs=obs,
        rnn_state=initial_actor_critic_state(cfg, num_envs),
        key=carry_key,
        ep_return=jnp.zeros(num_envs, jnp.float32),
        ep_len=jnp.zeros(num_envs, jnp.float32),
        ep_return_raw=jnp.zeros(num_envs, jnp.float32),
        shaping=shaping,
    )


def _process_rewards(cfg, rewards):
    """Reward scale/clip (reference batched_sampling.py:208-214)."""
    rewards = rewards * cfg.reward_scale
    return jnp.clip(rewards, -cfg.reward_clip, cfg.reward_clip)


def make_rollout_fn(cfg, env: DeviceEnv, env_info, model) -> Callable:
    """Build rollout(params, obs_rms, sampler_state, policy_version, policy_id)
    -> (sampler_state, trajectory, episodic_stats).

    One jitted program: scan of [policy forward -> action sample -> vectorized
    env step] over cfg.rollout steps.
    """
    action_space = env_info.action_space
    a_dtype = jnp.int32 if action_dtype(action_space) == "int32" else jnp.float32

    def policy_step(params, obs_rms, obs, rnn_state, key):
        normalized_obs = obs_rms_normalize(obs_rms, _static_preprocess(cfg, obs)) if obs_rms is not None else _static_preprocess(cfg, obs)
        action_params, values, new_rnn = model.apply(params, normalized_obs, rnn_state)
        # optional action masking: the env publishes a mask under obs['action_mask']
        # (reference CategoricalActionDistribution action_mask support)
        dist = get_action_distribution(action_space, action_params, obs.get("action_mask"))
        actions, log_probs = sample_actions_log_probs(dist, key)
        return actions.astype(a_dtype), log_probs, action_params, values, new_rnn

    def rollout(params, obs_rms, ss: SamplerState, policy_version, policy_id: int):
        def step_fn(carry, _):
            ss = carry
            key, k_act, k_env = jax.random.split(ss.key, 3)

            actions, log_probs, action_params, values, new_rnn = policy_step(
                params, obs_rms, ss.obs, ss.rnn_state, k_act
            )

            next_obs, env_states, rewards, dones, info = vector_step(env, k_env, ss.env_states, actions, ss.shaping)
            proc_rewards = _process_rewards(cfg, rewards)

            # episodic bookkeeping: accumulate, emit on done, reset accumulators
            ep_return = ss.ep_return + proc_rewards
            ep_return_raw = ss.ep_return_raw + rewards
            ep_len = ss.ep_len + 1.0
            done_f = dones.astype(jnp.float32)
            completed = {
                "count": jnp.sum(done_f),
                "return_sum": jnp.sum(done_f * ep_return),
                "raw_return_sum": jnp.sum(done_f * ep_return_raw),
                "len_sum": jnp.sum(done_f * ep_len),
            }

            # rnn state resets at episode boundaries (reference batched_sampling.py:215-228)
            next_rnn = jnp.where(done_f[:, None] > 0, jnp.zeros_like(new_rnn), new_rnn)

            transition = {
                "obs": ss.obs,
                "rnn_states": ss.rnn_state,
                "actions": actions,
                "action_logits": action_params,
                "log_prob_actions": log_probs,
                "values": values,
                "rewards": proc_rewards,
                "dones": done_f,
                "time_outs": info["time_outs"].astype(jnp.float32),
                "policy_version": jnp.full(values.shape, policy_version, jnp.int32),
                "policy_id": jnp.full(values.shape, policy_id, jnp.int32),
            }

            new_ss = ss.replace(
                env_states=env_states,
                obs=next_obs,
                rnn_state=next_rnn,
                key=key,
                ep_return=ep_return * (1.0 - done_f),
                ep_len=ep_len * (1.0 - done_f),
                ep_return_raw=ep_return_raw * (1.0 - done_f),
            )
            return new_ss, (transition, completed)

        ss, (traj, completed) = jax.lax.scan(step_fn, ss, None, length=cfg.rollout)

        # T+1 entries for bootstrap (reference batched_sampling.py:289-296)
        traj["obs"] = {k: jnp.concatenate([v, ss.obs[k][None]], axis=0) for k, v in traj["obs"].items()}
        traj["rnn_states"] = jnp.concatenate([traj["rnn_states"], ss.rnn_state[None]], axis=0)

        episodic_stats = {k: jnp.sum(v) for k, v in completed.items()}
        return ss, traj, episodic_stats

    return rollout


def _static_preprocess(cfg, obs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Static obs preprocessing: cast + subtract-mean/scale.

    Like the reference (utils/normalize.py:60-67), sub-mean/scale apply ONLY to
    the default "obs" key. Integer observations (token ids, e.g. DMLab INSTR)
    are passed through untouched so encoders can feed them to embedding
    lookups (the reference routes these around the normalizer with per-input
    dtype hooks, model/actor_critic.py:64-71)."""
    sub, scale = cfg.obs_subtract_mean, cfg.obs_scale
    out = {}
    for k, v in obs.items():
        if jnp.issubdtype(v.dtype, jnp.integer) and k != "obs":
            out[k] = v
            continue
        x = v.astype(jnp.float32)
        if k == "obs":
            if sub != 0.0:
                x = x - sub
            if scale != 1.0:
                x = x / scale
        out[k] = x
    return out


def trajectory_num_transitions(cfg, env_info, num_envs: int) -> int:
    return num_envs * cfg.rollout
