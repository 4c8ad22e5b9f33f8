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
from sample_factory_tpu.envs.device_env import DeviceEnv, vector_reset, vector_step, vector_step_ma
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


def init_mixed_sampler_state(cfg, env: DeviceEnv, key, num_envs: int, num_policies: int) -> SamplerState:
    """Sampler state for multi-agent envs with within-env policy mixing:
    obs/rnn/episodic accumulators live in SLOT-major form ([num_envs *
    num_agents, ...]); env states stay env-major. Shaping, when supported,
    is stacked per policy ([P] leaves) and gathered per agent slot at step
    time — PBT mutates one policy's coefficients without touching others."""
    A = env.num_agents
    reset_key, carry_key = jax.random.split(key)
    obs, env_states = vector_reset(env, reset_key, num_envs)  # obs leaves [N, A, ...]
    slots = num_envs * A
    obs = {k: v.reshape((slots,) + v.shape[2:]) for k, v in obs.items()}
    shaping = None
    if getattr(env, "supports_dynamic_shaping", False) and env.reward_shaping:
        shaping = {
            k: jnp.full((num_policies,), v, jnp.float32) for k, v in env.reward_shaping.items()
        }
    return SamplerState(
        env_states=env_states,
        obs=obs,
        rnn_state=initial_actor_critic_state(cfg, slots),
        key=carry_key,
        ep_return=jnp.zeros(slots, jnp.float32),
        ep_len=jnp.zeros(slots, jnp.float32),
        ep_return_raw=jnp.zeros(slots, jnp.float32),
        shaping=shaping,
    )


def make_mixed_rollout_fn(cfg, env: DeviceEnv, env_info, model, num_policies: int) -> Callable:
    """Rollout for multi-agent device envs with per-agent policy assignment
    (within-env policy mixing / self-play).

    The reference routes each agent's obs to its policy's inference worker
    (non_batched_sampling.py:25-313, agent_policy_mapping.py:47-59); with the
    population stacked on device we run all P forwards on every slot and
    select per slot (the host path's P-way-forward+select, host_sampling.py),
    keeping the whole rollout one fused program.

    rollout(stacked_params, stacked_obs_rms, ss, slot_policies, policy_versions)
      -> (ss, traj [T, slots, ...], ep_stats {count/return_sum/...: [P]})
    """
    action_space = env_info.action_space
    a_dtype = jnp.int32 if action_dtype(action_space) == "int32" else jnp.float32
    A = env.num_agents
    P = num_policies

    def single_policy_step(params, obs_rms, obs, rnn_state, key):
        normalized = obs_rms_normalize(obs_rms, _static_preprocess(cfg, obs)) if obs_rms is not None else _static_preprocess(cfg, obs)
        action_params, values, new_rnn = model.apply(params, normalized, rnn_state)
        dist = get_action_distribution(action_space, action_params, obs.get("action_mask"))
        actions, log_probs = sample_actions_log_probs(dist, key)
        return actions.astype(a_dtype), log_probs, action_params, values, new_rnn

    def mixed_policy_step(stacked_params, stacked_obs_rms, obs, rnn_state, slot_policies, key):
        keys = jax.random.split(key, P)
        if stacked_obs_rms is None:
            outs = jax.vmap(lambda p, k: single_policy_step(p, None, obs, rnn_state, k))(stacked_params, keys)
        else:
            outs = jax.vmap(lambda p, orms, k: single_policy_step(p, orms, obs, rnn_state, k))(
                stacked_params, stacked_obs_rms, keys
            )
        idx = jnp.arange(slot_policies.shape[0])
        return jax.tree.map(lambda x: x[slot_policies, idx], outs)

    def rollout(stacked_params, stacked_obs_rms, ss: SamplerState, slot_policies, policy_versions):
        slots = slot_policies.shape[0]
        num_envs = slots // A
        onehot = jax.nn.one_hot(slot_policies, P)  # [slots, P]
        slot_versions = jnp.asarray(policy_versions, jnp.int32)[slot_policies]

        # per-agent shaping gathered from the per-policy stacks
        shaping = None
        if ss.shaping is not None:
            shaping = {k: v[slot_policies].reshape(num_envs, A) for k, v in ss.shaping.items()}

        def step_fn(carry, _):
            ss = carry
            key, k_act, k_env = jax.random.split(ss.key, 3)

            actions, log_probs, action_params, values, new_rnn = mixed_policy_step(
                stacked_params, stacked_obs_rms, ss.obs, ss.rnn_state, slot_policies, k_act
            )

            env_actions = actions.reshape((num_envs, A) + actions.shape[1:])
            next_obs, env_states, rewards, dones, info = vector_step_ma(
                env, k_env, ss.env_states, env_actions, shaping
            )
            # flatten agent axes back into slots
            rewards = rewards.reshape(slots)
            dones = dones.reshape(slots)
            active = info["active"].reshape(slots)
            time_outs = info["time_outs"].reshape(slots)
            next_obs = {k: v.reshape((slots,) + v.shape[2:]) for k, v in next_obs.items()}

            proc_rewards = _process_rewards(cfg, rewards)
            ep_return = ss.ep_return + proc_rewards
            ep_return_raw = ss.ep_return_raw + rewards
            ep_len = ss.ep_len + 1.0
            done_f = dones.astype(jnp.float32)
            completed = {
                "count": done_f @ onehot,
                "return_sum": (done_f * ep_return) @ onehot,
                "raw_return_sum": (done_f * ep_return_raw) @ onehot,
                "len_sum": (done_f * ep_len) @ onehot,
            }

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
                "time_outs": time_outs.astype(jnp.float32),
                "policy_version": jnp.broadcast_to(slot_versions, values.shape).astype(jnp.int32),
                # inactive agents -> policy_id -1: masked out by every
                # learner's valids (reference is_active -> policy_id=-1)
                "policy_id": jnp.where(active, slot_policies, -1).astype(jnp.int32),
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

        traj["obs"] = {k: jnp.concatenate([v, ss.obs[k][None]], axis=0) for k, v in traj["obs"].items()}
        traj["rnn_states"] = jnp.concatenate([traj["rnn_states"], ss.rnn_state[None]], axis=0)

        episodic_stats = {k: jnp.sum(v, axis=0) for k, v in completed.items()}  # [P]
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
