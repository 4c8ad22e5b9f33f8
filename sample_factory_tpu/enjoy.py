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


def enjoy(cfg, num_episodes: Optional[int] = None, num_envs: int = 16, collect_episodes: Optional[list] = None) -> Tuple[int, float]:
    """Returns (status, avg_episode_reward). If collect_episodes is a list, it
    is filled with per-episode (reward, length) tuples. Dispatches to the
    host-env loop for gymnasium envs."""
    from sample_factory_tpu.utils.utils import configure_jax_platform

    # config first: the training run's saved --device must win (platform
    # choice freezes at first backend use)
    cfg = load_from_checkpoint(cfg)
    configure_jax_platform(cfg)
    eval_deterministic = cfg.eval_deterministic
    max_episodes = num_episodes if num_episodes is not None else min(cfg.max_num_episodes, 100)

    probe = create_env(cfg.env, cfg=cfg, env_config=None, render_mode=None)
    if not isinstance(probe, DeviceEnv):
        if hasattr(probe, "close"):
            probe.close()
        return enjoy_host(cfg, max_episodes, collect_episodes)
    env = probe
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
        # per-env done mask + final return/len so the host can extract
        # individual episodes (for eval CSVs and stats windows)
        completed = (done_f, ep_return, ep_len)
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
        ss, (done_mask, ep_returns, ep_lens) = eval_step(ts.params, ts.obs_rms, ss, k)
        done_np = np.asarray(done_mask) > 0
        rets = np.asarray(ep_returns)[done_np]
        lens = np.asarray(ep_lens)[done_np]
        episodes += int(done_np.sum())
        reward_sum += float(rets.sum())
        len_sum += float(lens.sum())
        if collect_episodes is not None:
            collect_episodes.extend(zip(rets.tolist(), lens.astype(int).tolist()))
        frames += num_envs
        if time.time() - start > 600:
            log.warning("Evaluation timed out")
            break

    avg_reward = reward_sum / max(1, episodes)
    avg_len = len_sum / max(1, episodes)
    log.info("Avg episode reward: %.3f, avg episode len: %.1f over %d episodes", avg_reward, avg_len, episodes)
    return 0, avg_reward


def enjoy_host(cfg, max_episodes: int, collect_episodes: Optional[list] = None) -> Tuple[int, float]:
    """Single host (gymnasium) env visualization/eval loop.

    Parity: reference enjoy.py:103-292 — render or record video, optional
    deterministic argmax, frameskip-compensating action repeat at eval time.
    """
    from sample_factory_tpu.algo.host_sampling import _convert_host_action
    from sample_factory_tpu.algo.running_mean_std import obs_rms_normalize as _norm
    from sample_factory_tpu.envs.env_info import extract_env_info
    from sample_factory_tpu.envs.gym_wrappers import wrap_host_env
    from sample_factory_tpu.models.actor_critic import initial_actor_critic_state

    render_mode = None
    if cfg.save_video:
        render_mode = "rgb_array"
    elif not cfg.no_render:
        render_mode = "human"

    # eval-time frameskip override: repeat each policy action so the effective
    # frameskip matches training (reference enjoy.py:108-114)
    train_frameskip = cfg.env_frameskip
    if cfg.eval_env_frameskip is not None:
        cfg.env_frameskip = cfg.eval_env_frameskip
    render_action_repeat = max(1, train_frameskip // max(1, cfg.env_frameskip))

    env = create_env(cfg.env, cfg=cfg, env_config=None, render_mode=render_mode)
    multiagent = getattr(env, "is_multiagent", False)
    if not multiagent:
        env = wrap_host_env(env, cfg)
    num_agents = env.num_agents if multiagent else 1
    env_info = extract_env_info(env, cfg)

    def to_batched_obs(obs):
        """Single-agent dict obs or multi-agent list -> dict of [A, ...] arrays."""
        if not multiagent:
            return {k: jnp.asarray(v)[None] for k, v in obs.items()}
        per_agent = [o if isinstance(o, dict) else {"obs": o} for o in obs]
        return {k: jnp.asarray(np.stack([o[k] for o in per_agent])) for k in per_agent[0]}
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)

    key = jax.random.PRNGKey(cfg.seed or 0)
    k_model, key = jax.random.split(key)
    obs, _ = env.reset(seed=cfg.seed)
    example_obs = to_batched_obs(obs)
    ts = init_train_state(cfg, env_info, model, tx, k_model, example_obs)
    restored = load_checkpoint(cfg, cfg.policy_index, ts)
    if restored is None:
        log.error("No checkpoint found for policy %d", cfg.policy_index)
        return 1, 0.0
    ts, env_steps, _ = restored
    log.info("Evaluating checkpoint at %d env steps", env_steps)

    a_dtype = jnp.int32 if action_dtype(env_info.action_space) == "int32" else jnp.float32

    @jax.jit
    def policy_step(params, obs_rms, obs, rnn_state, key):
        normalized = _norm(obs_rms, _static_preprocess(cfg, obs)) if obs_rms is not None else _static_preprocess(cfg, obs)
        action_params, values, new_rnn = model.apply(params, normalized, rnn_state)
        dist = get_action_distribution(env_info.action_space, action_params, obs.get("action_mask"))
        if cfg.eval_deterministic:
            actions = argmax_actions(dist)
        else:
            actions = dist.sample(key)
        return actions.astype(a_dtype), new_rnn

    rnn = initial_actor_critic_state(cfg, num_agents)
    frames = []
    episodes, reward_sum, len_sum = 0, 0.0, 0.0
    ep_reward, ep_len, total_frames = np.zeros(num_agents), 0, 0
    fps_delay = 1.0 / cfg.fps if cfg.fps > 0 else 0.0

    def render_frame():
        if render_mode == "rgb_array" and len(frames) < cfg.video_frames:
            frames.append(env.render())
        elif render_mode == "human":
            env.render()
            if fps_delay:
                time.sleep(fps_delay)

    while episodes < max_episodes and total_frames < cfg.max_num_frames:
        obs_dev = to_batched_obs(obs)
        key, k = jax.random.split(key)
        actions, rnn = policy_step(ts.params, ts.obs_rms, obs_dev, rnn, k)
        acts = np.asarray(actions)

        done = False
        for _ in range(render_action_repeat):
            if multiagent:
                action_list = [_convert_host_action(env.action_space, acts[a]) for a in range(num_agents)]
                obs, rewards, terms, truncs, infos = env.step(action_list)
                ep_reward += np.asarray(rewards, np.float64)
                done = all(bool(t) or bool(tr) for t, tr in zip(terms, truncs))
            else:
                a = acts[0]
                if a.shape and a.shape[0] == 1 and np.issubdtype(a.dtype, np.integer):
                    a = int(a[0])
                obs, reward, terminated, truncated, info = env.step(a)
                ep_reward += float(reward)
                done = terminated or truncated
            ep_len += 1
            total_frames += 1
            render_frame()
            if done:
                break

        if done:
            episodes += 1
            ep_rew = float(ep_reward.mean())
            reward_sum += ep_rew
            len_sum += ep_len
            if collect_episodes is not None:
                collect_episodes.append((ep_rew, ep_len))
            log.info("Episode %d: reward %.3f, length %d", episodes, ep_rew, ep_len)
            ep_reward, ep_len = np.zeros(num_agents), 0
            rnn = initial_actor_critic_state(cfg, num_agents)
            obs, _ = env.reset()

    env.close()
    avg_reward = reward_sum / max(1, episodes)
    log.info("Avg episode reward: %.3f over %d episodes", avg_reward, episodes)

    if cfg.save_video and frames:
        from sample_factory_tpu.hub.huggingface_hub_utils import generate_replay_video
        from sample_factory_tpu.utils.utils import experiment_dir

        video_fps = cfg.fps if cfg.fps > 0 else 30
        generate_replay_video(experiment_dir(cfg), frames, video_fps, cfg)

    if cfg.push_to_hub and cfg.hf_repository:
        from sample_factory_tpu.hub.huggingface_hub_utils import generate_model_card, push_to_hf
        from sample_factory_tpu.utils.utils import experiment_dir

        rewards = [r for r, _ in (collect_episodes or [])] or [avg_reward]
        generate_model_card(experiment_dir(cfg), cfg.algo, cfg.env, cfg.hf_repository, rewards)
        push_to_hf(experiment_dir(cfg), cfg.hf_repository)

    return 0, avg_reward


def main() -> int:
    """Generic CLI: visualize any registered env, or a plain gymnasium env by
    id (reference keeps enjoy as a library + per-env scripts; this entry covers
    `python -m sample_factory_tpu.enjoy --env=<gym id>` for convenience)."""
    import sys

    from sample_factory_tpu.algo.context import global_env_registry
    from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args

    parser, partial_cfg = parse_sf_args(evaluation=True)
    cfg = parse_full_cfg(parser)
    if cfg.env not in global_env_registry():
        from sf_examples_tpu.train_gym_env import register_gym_env

        register_gym_env(cfg.env)
    status, _ = enjoy(cfg)
    return status


if __name__ == "__main__":
    import sys

    sys.exit(main())
