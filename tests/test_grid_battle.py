"""GridBattle on-device pixel env: dynamics invariants + learning."""

import json
import glob
from os.path import join

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.envs.builtin.grid_battle import GridBattleEnv
from sample_factory_tpu.envs.device_env import autoreset_step
from sample_factory_tpu.train import run_rl
from sf_examples_tpu.train_synthetic import parse_custom_args, register_synthetic_components


def test_dynamics_invariants():
    env = GridBattleEnv(size=16, num_enemies=4, episode_len=32)
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key)
    assert obs["obs"].shape == (16, 16, 3)
    total_reward = 0.0
    for i in range(64):
        key, k = jax.random.split(key)
        action = jnp.asarray([i % 6], jnp.int32)
        obs, state, reward, done, info = autoreset_step(env, k, state, action)
        assert obs["obs"].shape == (16, 16, 3)
        assert float(jnp.max(obs["obs"])) <= 1.0 and float(jnp.min(obs["obs"])) >= 0.0
        total_reward += float(reward)
    # positions always in bounds
    assert 0 <= int(state["agent"][0]) < 16 and 0 <= int(state["agent"][1]) < 16


@pytest.mark.medium
def test_grid_battle_learns(tmp_path):
    reset_global_context()
    register_synthetic_components()
    argv = [
        "--env=grid_battle_small",
        "--experiment=gb",
        f"--train_dir={tmp_path}",
        "--seed=3",
        "--device=cpu",
        "--use_rnn=False",
        "--encoder_conv_architecture=convnet_impala",
        "--encoder_conv_mlp_layers", "64",
        "--rollout=32",
        "--batch_size=1024",
        "--num_workers=2",
        "--num_envs_per_worker=16",
        "--learning_rate=3e-4",
        # XLA CPU reductions are not bitwise-deterministic across runs, and RL
        # curves amplify tiny divergence chaotically: give the run enough
        # budget that every realization of this seed clears the bar.
        "--train_for_env_steps=250000",
        "--experiment_summaries_interval=2",
    ]
    cfg = parse_custom_args(argv)
    assert run_rl(cfg) == 0
    jsonl = glob.glob(join(str(tmp_path), "gb", ".summary", "0", "summaries.jsonl"))[0]
    rewards = [json.loads(l)["train/reward"] for l in open(jsonl) if "train/reward" in json.loads(l)]
    # random play dies almost immediately (~0 reward); learning shows as a
    # clear upward trend within the small budget
    assert max(rewards) > max(0.6, rewards[0] + 0.5), f"did not learn: first={rewards[0]}, max={max(rewards)}"
    reset_global_context()
