"""Fast parallel evaluation without a learner.

Parity: reference `sample_factory/eval.py:77-119` (`do_eval`: full sampler, no
learner, per-episode stats to CSV) built on the reference's
EvalSamplingAPI (`algo/sampling/evaluation_sampling_api.py`). Here evaluation
reuses the training samplers directly: vmapped device envs or the host worker
pool, with the policy stepped under jit.
"""

from __future__ import annotations

import csv
import os
import time
from os.path import join
from typing import List, Optional, Tuple

import jax
import numpy as np

from sample_factory_tpu.cfg.arguments import load_from_checkpoint
from sample_factory_tpu.envs.env_info import obtain_env_info
from sample_factory_tpu.utils.utils import experiment_dir, log


def _eval_device_env(cfg, num_episodes: int) -> List[Tuple[float, int]]:
    from sample_factory_tpu.enjoy import enjoy  # device-env eval loop

    episodes: List[Tuple[float, int]] = []
    status, _ = enjoy(cfg, num_episodes=num_episodes, num_envs=64, collect_episodes=episodes)
    if status != 0:
        raise RuntimeError("evaluation failed")
    return episodes[:num_episodes]


def _eval_host_env(cfg, num_episodes: int, register_fn=None) -> List[Tuple[float, int]]:
    from sample_factory_tpu.algo.host_sampling import HostVectorSampler
    from sample_factory_tpu.algo.learning import init_train_state
    from sample_factory_tpu.algo.optimizers import make_optimizer
    from sample_factory_tpu.models.actor_critic import create_actor_critic
    from sample_factory_tpu.runner.checkpoint import load_checkpoint

    env_info = obtain_env_info(cfg, register_fn=register_fn)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(cfg.seed or 0)
    k_model, key = jax.random.split(key)

    sampler = HostVectorSampler(cfg, env_info, model, register_fn=register_fn)
    sampler.start()
    try:
        example_obs = {k: jax.numpy.asarray(v[:2]) for k, v in sampler._split_obs(0).items()}
        ts = init_train_state(cfg, env_info, model, tx, k_model, example_obs)
        restored = load_checkpoint(cfg, cfg.policy_index, ts)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint for policy {cfg.policy_index}")
        ts, env_steps, _ = restored
        log.info("Evaluating checkpoint at %d env steps", env_steps)

        episodes: List[Tuple[float, int]] = []
        version = int(jax.device_get(ts.train_step))
        while len(episodes) < num_episodes:
            key, k = jax.random.split(key)
            _, stats = sampler.collect_rollout(ts.params, ts.obs_rms, k, version, cfg.policy_index)
            episodes.extend(sampler.episodic)
        return episodes[:num_episodes]
    finally:
        sampler.close()


def do_eval(cfg, register_fn=None) -> int:
    from sample_factory_tpu.utils.utils import configure_jax_platform

    # config first: the training run's saved --device must win (platform
    # choice freezes at first backend use)
    cfg = load_from_checkpoint(cfg)
    configure_jax_platform(cfg)
    num_episodes = int(cfg.sample_env_episodes)

    env_info = obtain_env_info(cfg, register_fn=register_fn)
    t0 = time.time()
    if env_info.is_device_env:
        episodes = _eval_device_env(cfg, num_episodes)
    else:
        episodes = _eval_host_env(cfg, num_episodes, register_fn=register_fn)
    elapsed = time.time() - t0

    rewards = [r for r, _ in episodes]
    lens = [l for _, l in episodes if l >= 0]
    log.info(
        "Evaluated %d episodes in %.1fs: avg reward %.3f +/- %.3f%s",
        len(episodes),
        elapsed,
        float(np.mean(rewards)),
        float(np.std(rewards)),
        f", avg len {np.mean(lens):.1f}" if lens else "",
    )

    csv_folder = cfg.csv_folder_name or "eval"
    out_dir = join(experiment_dir(cfg), csv_folder)
    os.makedirs(out_dir, exist_ok=True)
    out_path = join(out_dir, f"eval_p{cfg.policy_index}.csv")
    with open(out_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["episode", "reward", "length"])
        for i, (r, l) in enumerate(episodes):
            writer.writerow([i, r, l])
    log.info("Wrote %s", out_path)
    return 0


def main() -> int:
    """Generic CLI analog of reference eval.py (fast parallel eval -> CSV)."""
    from sample_factory_tpu.algo.context import global_env_registry
    from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args

    parser, partial_cfg = parse_sf_args(evaluation=True)
    cfg = parse_full_cfg(parser)
    register_fn = None
    if cfg.env not in global_env_registry():
        import functools

        from sf_examples_tpu.train_gym_env import register_gym_env

        register_fn = functools.partial(register_gym_env, cfg.env)
        register_fn()
    return do_eval(cfg, register_fn=register_fn)


if __name__ == "__main__":
    import sys

    sys.exit(main())
