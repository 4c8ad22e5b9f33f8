"""Benchmark: fused on-device PPO throughput on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Scenario mirrors the reference's strongest single-accelerator baseline —
IsaacGym Ant batched/serial/sync sampling, MLP policy, 4096 env agents,
batch 32768 (BASELINE.md: 204,651-220,435 FPS on 1 GPU,
reference sample_factory/benchmarking/benchmarking_isaacgym_ant.txt) — using a
built-in on-device continuous-control env of the same obs/action widths, so
the number measures the framework (sampler+learner+model) rather than physics.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

BASELINE_FPS = 204651.0  # IsaacGym Ant, 1 GPU, reference benchmark (lower bound of the range)


def main() -> int:
    from sample_factory_tpu.algo.learning import init_train_state, make_train_fn
    from sample_factory_tpu.algo.optimizers import make_optimizer
    from sample_factory_tpu.algo.sampling import init_sampler_state, make_rollout_fn
    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.envs.builtin.synthetic import SyntheticContinuousEnv
    from sample_factory_tpu.envs.env_info import extract_env_info
    from sample_factory_tpu.models.actor_critic import create_actor_critic
    from sample_factory_tpu.parallel.mesh import make_mesh, replicate_tree, shard_env_axis

    num_envs = 4096
    rollout = 16
    cfg = default_cfg(
        env="bench_env",
        argv=[
            "--use_rnn=False",
            "--encoder_mlp_layers", "256", "128", "64",
            f"--rollout={rollout}",
            "--recurrence=1",
            "--batch_size=32768",
            "--num_epochs=2",
            f"--num_envs={num_envs}",
            "--num_workers=1",
            "--async_rl=False",
            "--normalize_input=True",
            "--normalize_returns=True",
            "--kl_loss_coeff=0.1",
            "--seed=0",
        ],
    )

    # Ant-like widths: obs 60, act 8
    class BenchEnv(SyntheticContinuousEnv):
        def __init__(self):
            super().__init__(dim=8, episode_len=1000)
            from sample_factory_tpu.envs.spaces import Box, make_dict_spec

            self.obs_space = make_dict_spec({"obs": Box((60,), 0.0, 1.0)})

        def _obs(self, key):
            return {"obs": jax.random.uniform(key, (60,))}

    env = BenchEnv()
    env_info = extract_env_info(env, cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)

    mesh = make_mesh(cfg)
    key = jax.random.PRNGKey(0)
    k_env, k_model, key = jax.random.split(key, 3)
    ss = init_sampler_state(cfg, env, k_env, num_envs)
    example_obs = {k: v[:2] for k, v in ss.obs.items()}
    ts = init_train_state(cfg, env_info, model, tx, k_model, example_obs)
    ts = replicate_tree(ts, mesh)
    ss = shard_env_axis(ss, mesh)

    rollout_fn = make_rollout_fn(cfg, env, env_info, model)
    train_fn = make_train_fn(cfg, env_info, model, tx, 0)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_iteration(ts, ss, key):
        ss, traj, ep_stats = rollout_fn(ts.params, ts.obs_rms, ss, ts.train_step, 0)
        ts, stats = train_fn(ts, traj, key)
        return ts, ss, stats

    # warmup / compile
    for _ in range(3):
        key, k = jax.random.split(key)
        ts, ss, stats = train_iteration(ts, ss, k)
    jax.block_until_ready(stats)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        ts, ss, stats = train_iteration(ts, ss, k)
    jax.block_until_ready(stats)
    elapsed = time.perf_counter() - t0

    steps_per_sec = iters * num_envs * rollout / elapsed
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_1chip_sync_ppo",
                "value": round(steps_per_sec, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_FPS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
