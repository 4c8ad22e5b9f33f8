"""Tensor parallelism: sharding wide layers over the 'model' mesh axis must
not change the math — only the layout. Runs the full rollout+train iteration
on a (2 data x 2 model) mesh and compares against the fully-replicated
(4 data x 1 model) run with identical seeds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sample_factory_tpu.algo.learning import init_train_state, make_train_fn
from sample_factory_tpu.algo.optimizers import make_optimizer
from sample_factory_tpu.algo.sampling import init_sampler_state, make_rollout_fn
from sample_factory_tpu.cfg.arguments import default_cfg
from sample_factory_tpu.envs.builtin.synthetic import SyntheticDiscreteEnv
from sample_factory_tpu.envs.env_info import extract_env_info
from sample_factory_tpu.models.actor_critic import create_actor_critic
from sample_factory_tpu.parallel.mesh import make_mesh, replicate_tree, shard_env_axis, shard_params_tp


def _setup(mesh_data, mesh_model, num_envs=16):
    argv = [
        "--use_rnn=False",
        "--encoder_mlp_layers", "512", "512",
        "--rollout=8",
        "--recurrence=1",
        "--batch_size=64",
        f"--num_envs={num_envs}",
        f"--mesh_data={mesh_data}",
        f"--mesh_model={mesh_model}",
        "--tp_min_layer_width=256",
        "--num_epochs=1",
        "--seed=0",
    ]
    cfg = default_cfg(env="synthetic_discrete", argv=argv)
    env = SyntheticDiscreteEnv(num_actions=4, episode_len=16, res=8)
    env_info = extract_env_info(env, cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    return cfg, env, env_info, model


def _run_iterations(mesh_data, mesh_model, iters=3):
    cfg, env, env_info, model = _setup(mesh_data, mesh_model)
    devices = jax.devices()[: mesh_data * mesh_model]
    assert len(devices) == mesh_data * mesh_model
    mesh = make_mesh(cfg, devices=devices)
    tx = make_optimizer(cfg)

    key = jax.random.PRNGKey(0)
    k_env, k_model, k_train = jax.random.split(key, 3)
    ss = init_sampler_state(cfg, env, k_env, cfg.num_envs)
    example_obs = {k: v[:2] for k, v in ss.obs.items()}
    ts = init_train_state(cfg, env_info, model, tx, k_model, example_obs)

    ts = shard_params_tp(ts, mesh, cfg.tp_min_layer_width) if mesh_model > 1 else replicate_tree(ts, mesh)
    ss = shard_env_axis(ss, mesh)

    rollout_fn = make_rollout_fn(cfg, env, env_info, model)
    train_fn = make_train_fn(cfg, env_info, model, tx, 0)

    @jax.jit
    def train_iteration(ts, ss, key):
        ss, traj, _ = rollout_fn(ts.params, ts.obs_rms, ss, ts.train_step, 0)
        ts, stats = train_fn(ts, traj, key)
        return ts, ss, stats

    losses = []
    for i in range(iters):
        ts, ss, stats = train_iteration(ts, ss, jax.random.fold_in(k_train, i))
        losses.append(float(stats["loss"]))
    return losses


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_tp_matches_replicated():
    losses_dp = _run_iterations(4, 1)
    losses_tp = _run_iterations(2, 2)
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-3, atol=2e-4)
    assert all(np.isfinite(losses_tp))
