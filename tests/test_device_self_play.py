"""Device-path multi-agent self-play: GridDuel dynamics, within-env policy
mixing (P-way forward + per-slot select), and end-to-end 2-policy training.

Covers the reference's per-agent-policy machinery
(`algo/sampling/non_batched_sampling.py:25-313` ActorState,
`algo/utils/agent_policy_mapping.py:47-59` mixing) re-designed for the device
path: one fused rollout program serves the whole population.
"""

import glob
import json
from os.path import join

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sample_factory_tpu.algo.context import reset_global_context
from sample_factory_tpu.envs.builtin.grid_duel import GridDuelEnv
from sample_factory_tpu.envs.device_env import autoreset_step_ma
from sample_factory_tpu.train import run_rl
from sf_examples_tpu.train_synthetic import parse_custom_args, register_synthetic_components


# ----------------------------------------------------------------- dynamics


def test_grid_duel_dynamics():
    env = GridDuelEnv(size=10, episode_len=32, shoot_range=9, health=2.0)
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key)
    assert obs["obs"].shape == (2, 10, 10, 3)

    # egocentric symmetry: agent 0's self-channel shows what agent 1 sees as
    # the opponent channel
    np.testing.assert_array_equal(
        np.asarray(obs["obs"][0, :, :, 0]), np.asarray(obs["obs"][1, :, :, 1])
    )

    # place both on one row: simultaneous shots hit both
    state["pos"] = jnp.asarray([[5, 1], [5, 8]], jnp.int32)
    both_shoot = jnp.asarray([4, 4], jnp.int32)
    obs, state2, reward, term, trunc, info = env.step(jax.random.PRNGKey(1), state, both_shoot)
    assert float(state2["health"][0]) == 1.0 and float(state2["health"][1]) == 1.0
    # hit_reward 1.0 - hit_penalty 0.5 each
    np.testing.assert_allclose(np.asarray(reward), [0.5, 0.5], atol=1e-6)
    assert not bool(term[0])

    # second exchange kills both -> terminated for the env
    obs, state3, reward, term, trunc, info = env.step(jax.random.PRNGKey(2), state2, both_shoot)
    assert bool(term[0]) and bool(term[1])

    # idle actions never damage
    obs, state4, reward, term, trunc, info = env.step(jax.random.PRNGKey(3), state, jnp.asarray([5, 5]))
    assert float(state4["health"].sum()) == 4.0 and float(jnp.abs(reward).sum()) == 0.0


def test_grid_duel_autoreset_ma():
    env = GridDuelEnv(size=8, episode_len=5, shoot_range=1, health=1.0)
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key)
    for i in range(6):
        key, k = jax.random.split(key)
        obs, state, reward, done, info = autoreset_step_ma(env, k, state, jnp.asarray([5, 5]))
    # truncated at step 5 -> autoreset back to a fresh episode
    assert int(state["steps"]) <= 1
    assert float(state["health"].min()) == 1.0


# ------------------------------------------------------ mixed-policy rollout


def _bias_action(params, action_idx: int, scale: float = 50.0):
    """Return params whose action head always emits `action_idx` (bias spike)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def edit(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any("action_parameterization" in str(n) for n in names) and str(names[-1]) == "bias":
            return jnp.zeros_like(leaf).at[action_idx].set(scale)
        return leaf

    return jax.tree_util.tree_map_with_path(edit, params)


def test_mixed_rollout_routes_slots_to_their_policies():
    from sample_factory_tpu.algo.learning import init_train_state
    from sample_factory_tpu.algo.optimizers import make_optimizer
    from sample_factory_tpu.algo.sampling import init_mixed_sampler_state, make_mixed_rollout_fn
    from sample_factory_tpu.cfg.arguments import default_cfg
    from sample_factory_tpu.envs.env_info import extract_env_info
    from sample_factory_tpu.models.actor_critic import create_actor_critic

    cfg = default_cfg(
        env="grid_duel_small",
        argv=[
            "--use_rnn=False",
            "--encoder_conv_architecture=convnet_simple",
            "--encoder_conv_mlp_layers", "32",
            "--rollout=4",
            "--recurrence=1",
            "--num_envs=6",
            "--normalize_input=False",
            "--seed=0",
        ],
    )
    env = GridDuelEnv(size=8, episode_len=16)
    env_info = extract_env_info(env, cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)

    key = jax.random.PRNGKey(0)
    ss = init_mixed_sampler_state(cfg, env, key, num_envs=6, num_policies=2)
    example_obs = {k: v[:2] for k, v in ss.obs.items()}
    ts0 = init_train_state(cfg, env_info, model, tx, jax.random.PRNGKey(1), example_obs)
    # policy 0 always acts 2, policy 1 always acts 3
    p0 = _bias_action(ts0.params, 2)
    p1 = _bias_action(ts0.params, 3)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p0, p1)

    slot_policies = jnp.asarray([0, 1] * 6, jnp.int32)  # mixed within every env
    rollout = make_mixed_rollout_fn(cfg, env, env_info, model, num_policies=2)
    ss, traj, ep = jax.jit(rollout)(stacked, None, ss, slot_policies, jnp.asarray([7, 9]))

    actions = np.asarray(traj["actions"])[..., 0]  # [T, slots]
    pids = np.asarray(traj["policy_id"])  # [T, slots]
    versions = np.asarray(traj["policy_version"])
    for s in range(12):
        want = int(slot_policies[s])
        assert (actions[:, s] == (2 if want == 0 else 3)).all(), f"slot {s} actions {actions[:, s]}"
        assert (pids[:, s] == want).all()
        assert (versions[:, s] == (7 if want == 0 else 9)).all()
    # episodic stats come back per policy
    assert np.asarray(ep["count"]).shape == (2,)


# ------------------------------------------------------------- e2e training


@pytest.mark.slow
def test_grid_duel_selfplay_learns(tmp_path):
    """2-policy self-play + PBT through the population runner, judged the way
    adversarial self-play must be judged: ABSOLUTE reward plateaus as both
    sides learn to dodge, so the learning signal is an EXPLOIT evaluation —
    the trained policy must decisively beat a fresh-init policy in direct
    play (calibration: margin ~3.0 avg episodic return after 2.5M steps)."""
    import jax
    import jax.numpy as jnp

    reset_global_context()
    register_synthetic_components()
    argv = [
        "--env=grid_duel_small",
        "--experiment=duel",
        f"--train_dir={tmp_path}",
        "--seed=3",
        "--device=cpu",
        "--num_policies=2",
        "--pbt_mix_policies_in_one_env=True",
        "--with_pbt=True",
        "--pbt_period_env_steps=200000",
        "--pbt_start_mutation=200000",
        "--use_rnn=False",
        "--encoder_conv_architecture=convnet_simple",
        "--encoder_conv_mlp_layers", "64",
        "--num_envs=128",
        "--rollout=32",
        "--batch_size=4096",
        "--num_epochs=2",
        "--learning_rate=1e-3",
        "--train_for_env_steps=900000",
        "--experiment_summaries_interval=2",
    ]
    cfg = parse_custom_args(argv)
    assert run_rl(cfg) == 0
    for p in (0, 1):
        jsonl = glob.glob(join(str(tmp_path), "duel", ".summary", str(p), "summaries.jsonl"))[0]
        rewards = [json.loads(l)["train/reward"] for l in open(jsonl) if "train/reward" in json.loads(l)]
        assert len(rewards) >= 3

    # ---- exploit evaluation: trained policy 0 vs a fresh-init opponent
    from sample_factory_tpu.algo.learning import init_train_state
    from sample_factory_tpu.algo.optimizers import make_optimizer
    from sample_factory_tpu.algo.sampling import init_mixed_sampler_state, make_mixed_rollout_fn
    from sample_factory_tpu.envs.builtin.grid_duel import make_grid_duel_env
    from sample_factory_tpu.envs.env_info import extract_env_info
    from sample_factory_tpu.models.actor_critic import create_actor_critic
    from sample_factory_tpu.runner.checkpoint import load_checkpoint

    env = make_grid_duel_env("grid_duel_small")
    env_info = extract_env_info(env, cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)
    eval_cfg = cfg
    eval_cfg.rollout = 96
    key = jax.random.PRNGKey(0)
    ss = init_mixed_sampler_state(eval_cfg, env, key, 64, 2)
    example_obs = {k: v[:2] for k, v in ss.obs.items()}
    fresh = init_train_state(eval_cfg, env_info, model, tx, jax.random.PRNGKey(999), example_obs)
    trained, _, _ = load_checkpoint(cfg, 0, fresh)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), trained.params, fresh.params)
    orms = (
        jax.tree.map(lambda a, b: jnp.stack([a, b]), trained.obs_rms, fresh.obs_rms)
        if trained.obs_rms is not None
        else None
    )
    rollout = make_mixed_rollout_fn(eval_cfg, env, env_info, model, 2)
    ss, traj, ep = jax.jit(rollout)(
        stacked, orms, ss, jnp.asarray([0, 1] * 64, jnp.int32), jnp.asarray([1, 0])
    )
    ep = jax.device_get(ep)
    avg0 = float(ep["raw_return_sum"][0]) / max(1.0, float(ep["count"][0]))
    avg1 = float(ep["raw_return_sum"][1]) / max(1.0, float(ep["count"][1]))
    assert avg0 > avg1 + 0.8, f"trained policy does not exploit a fresh one: {avg0:.3f} vs {avg1:.3f}"
    reset_global_context()


def test_grid_duel_selfplay_smoke(tmp_path):
    """Fast default-tier version: 2-policy mixed self-play runs end to end,
    writes per-policy summaries, and PBT infrastructure engages."""
    reset_global_context()
    register_synthetic_components()
    argv = [
        "--env=grid_duel_small",
        "--experiment=duel_smoke",
        f"--train_dir={tmp_path}",
        "--seed=3",
        "--device=cpu",
        "--num_policies=2",
        "--pbt_mix_policies_in_one_env=True",
        "--use_rnn=False",
        "--encoder_conv_architecture=convnet_simple",
        "--encoder_conv_mlp_layers", "32",
        "--num_envs=8",
        "--rollout=8",
        "--batch_size=128",
        "--num_epochs=1",
        "--train_for_env_steps=2048",
        "--experiment_summaries_interval=1",
    ]
    cfg = parse_custom_args(argv)
    assert run_rl(cfg) == 0
    for p in (0, 1):
        jsonl = glob.glob(join(str(tmp_path), "duel_smoke", ".summary", str(p), "summaries.jsonl"))
        assert jsonl, f"policy {p} summaries missing"
    reset_global_context()
