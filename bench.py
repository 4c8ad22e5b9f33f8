"""Benchmark suite: single-chip PPO throughput on the three flagship regimes.

Prints one JSON line per scenario ({"metric", "value", "unit", "vs_baseline"});
the LAST line is the headline — on-device PPO on the REAL-physics AntEnv vs the
reference's strongest single-accelerator baseline (IsaacGym Ant, PhysX, 4096
env agents, 204,651 FPS on 1 GPU: reference
`sample_factory/benchmarking/benchmarking_isaacgym_ant.txt:1-30`) — and embeds
the full suite under "suite".

Scenarios (each vs its matching reference row, BASELINE.md):
  1. mlp_synthetic   — physics-free env of IsaacGym-Ant obs/action widths:
                       the framework+NN ceiling (sampler+learner overhead only;
                       labeled as such — the physics-bearing comparison is #3)
  2. grid_battle     — 24x24x3 pixel env, IMPALA conv + GRU-256, bf16 compute:
                       the ViZDoom-battle regime (pixels + recurrent PPO;
                       reference: 137,131 FPS on a 36-core Xeon + GPUs,
                       `benchmarking_xeon_36core.txt:31-45`)
  3. ant_physics     — AntEnv: real rigid-body quadruped dynamics
                       (envs/builtin/ant.py), 4096 envs, same widths as #1
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

ISAAC_ANT_FPS = 204651.0  # IsaacGym Ant, 1 GPU (lower bound of the published range)
VIZDOOM_XEON_FPS = 137131.0  # ViZDoom battle, 36-core Xeon + GPUs


def _run_scenario(cfg, env, num_envs: int, seed: int = 0):
    """Compile the fused train iteration for (cfg, env) and measure steady-state
    env-steps/s over an auto-calibrated timing window."""
    from sample_factory_tpu.algo.learning import init_train_state, make_train_fn
    from sample_factory_tpu.algo.optimizers import make_optimizer
    from sample_factory_tpu.algo.sampling import init_sampler_state, make_rollout_fn
    from sample_factory_tpu.envs.env_info import extract_env_info
    from sample_factory_tpu.models.actor_critic import create_actor_critic
    from sample_factory_tpu.parallel.mesh import make_mesh, replicate_tree, shard_env_axis

    env_info = extract_env_info(env, cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)

    mesh = make_mesh(cfg)
    key = jax.random.PRNGKey(seed)
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

    # calibrate the window so every scenario is timed over >= ~5 s
    t0 = time.perf_counter()
    key, k = jax.random.split(key)
    ts, ss, stats = train_iteration(ts, ss, k)
    jax.block_until_ready(stats)
    per_iter = max(time.perf_counter() - t0, 1e-5)
    iters = int(min(300, max(10, 5.0 / per_iter)))

    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        ts, ss, stats = train_iteration(ts, ss, k)
    jax.block_until_ready(stats)
    elapsed = time.perf_counter() - t0
    return iters * num_envs * cfg.rollout / elapsed


def bench_mlp_synthetic():
    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.envs.builtin.synthetic import SyntheticContinuousEnv
    from sample_factory_tpu.envs.spaces import Box, make_dict_spec

    num_envs = 4096
    cfg = default_cfg(
        env="bench_mlp",
        argv=[
            "--use_rnn=False",
            "--encoder_mlp_layers", "256", "128", "64",
            "--rollout=16",
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

    class BenchEnv(SyntheticContinuousEnv):
        """IsaacGym-Ant widths (obs 60, act 8), no physics."""

        def __init__(self):
            super().__init__(dim=8, episode_len=1000)
            self.obs_space = make_dict_spec({"obs": Box((60,), 0.0, 1.0)})

        def _obs(self, key):
            return {"obs": jax.random.uniform(key, (60,))}

    return _run_scenario(cfg, BenchEnv(), num_envs), num_envs


def bench_ant_physics():
    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.envs.builtin.ant import AntEnv

    num_envs = 4096
    cfg = default_cfg(
        env="bench_ant",
        argv=[
            "--use_rnn=False",
            "--encoder_mlp_layers", "256", "128", "64",
            "--rollout=16",
            "--recurrence=1",
            "--batch_size=32768",
            "--num_epochs=4",
            f"--num_envs={num_envs}",
            "--num_workers=1",
            "--async_rl=False",
            "--normalize_input=True",
            "--normalize_returns=True",
            "--seed=0",
        ],
    )
    return _run_scenario(cfg, AntEnv(), num_envs), num_envs


def bench_grid_battle():
    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.envs.builtin.grid_battle import GridBattleEnv

    num_envs = 1024
    cfg = default_cfg(
        env="bench_gb",
        argv=[
            "--use_rnn=True",
            "--rnn_type=gru",
            "--rnn_size=256",
            "--encoder_conv_architecture=convnet_impala",
            "--encoder_conv_mlp_layers", "256",
            "--compute_dtype=bfloat16",
            "--rollout=32",
            "--recurrence=32",
            "--batch_size=16384",
            "--num_epochs=1",
            f"--num_envs={num_envs}",
            "--num_workers=1",
            "--async_rl=False",
            "--normalize_input=True",
            "--seed=0",
        ],
    )
    return _run_scenario(cfg, GridBattleEnv(), num_envs), num_envs


def main() -> int:
    suite = []

    fps, n = bench_mlp_synthetic()
    suite.append(
        {
            "metric": "mlp_synthetic_sync_ppo_framework_ceiling",
            "value": round(fps, 1),
            "unit": "env_steps/s",
            "vs_baseline": round(fps / ISAAC_ANT_FPS, 3),
            "note": f"{n} physics-FREE envs, IsaacGym-Ant widths; framework+NN overhead ceiling, "
            "not a physics comparison (that is ant_physics_sync_ppo)",
        }
    )
    print(json.dumps(suite[-1]), flush=True)

    fps, n = bench_grid_battle()
    suite.append(
        {
            "metric": "grid_battle_pixel_rnn_ppo",
            "value": round(fps, 1),
            "unit": "env_steps/s",
            "vs_baseline": round(fps / VIZDOOM_XEON_FPS, 3),
            "note": f"{n} on-device 24x24x3 pixel envs, IMPALA conv + GRU-256, bf16; "
            "vs ViZDoom battle 137,131 FPS (36-core Xeon + GPUs)",
        }
    )
    print(json.dumps(suite[-1]), flush=True)

    fps, n = bench_ant_physics()
    headline = {
        "metric": "ant_physics_sync_ppo",
        "value": round(fps, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(fps / ISAAC_ANT_FPS, 3),
        "note": f"{n} on-device rigid-body ant envs (real dynamics, envs/builtin/ant.py) "
        "vs IsaacGym Ant PhysX 204,651 FPS (1 GPU)",
        "suite": suite + [None],  # placeholder replaced below
    }
    headline["suite"][-1] = {k: headline[k] for k in ("metric", "value", "unit", "vs_baseline")}
    print(json.dumps(headline), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
