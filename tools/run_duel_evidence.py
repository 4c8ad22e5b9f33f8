"""Device self-play PBT evidence run: GridDuel, 2 policies, mixed-policy
mode, PBT — the on-device analog of the reference's ViZDoom duel self-play
(reference sf_examples/vizdoom experiment grids). Judged by EXPLOIT
evaluation (trained policy vs fresh-init opponent), because absolute reward
plateaus in adversarial self-play as both sides improve.

    python tools/run_duel_evidence.py --train_dir=/tmp/evidence \
        --steps=20000000 [--device=cpu]
"""

import argparse
import glob
import json
import os
import sys
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_dir", default="/tmp/evidence")
    ap.add_argument("--experiment", default="grid_duel_selfplay_20M")
    ap.add_argument("--steps", type=int, default=20_000_000)
    ap.add_argument("--device", default="tpu")
    args = ap.parse_args()

    from sample_factory_tpu.algo.context import reset_global_context
    from sample_factory_tpu.train import run_rl
    from sf_examples_tpu.train_synthetic import parse_custom_args, register_synthetic_components

    reset_global_context()
    register_synthetic_components()
    argv = [
        "--env=grid_duel",
        f"--experiment={args.experiment}",
        f"--train_dir={args.train_dir}",
        "--seed=3",
        f"--device={args.device}",
        "--num_policies=2",
        "--pbt_mix_policies_in_one_env=True",
        "--with_pbt=True",
        "--pbt_period_env_steps=2000000",
        "--pbt_start_mutation=2000000",
        "--use_rnn=False",
        "--encoder_conv_architecture=convnet_simple",
        "--encoder_conv_mlp_layers", "128",
        "--num_envs=512",
        "--rollout=32",
        "--batch_size=16384",
        "--num_epochs=2",
        "--learning_rate=1e-3",
        f"--train_for_env_steps={args.steps}",
        "--experiment_summaries_interval=2",
    ]
    cfg = parse_custom_args(argv)
    assert run_rl(cfg, register_fn=register_synthetic_components) == 0

    # ---- exploit evaluation: trained policy 0 vs a fresh-init opponent
    import jax
    import jax.numpy as jnp

    from sample_factory_tpu.algo.learning import init_train_state
    from sample_factory_tpu.algo.optimizers import make_optimizer
    from sample_factory_tpu.algo.sampling import init_mixed_sampler_state, make_mixed_rollout_fn
    from sample_factory_tpu.envs.builtin.grid_duel import make_grid_duel_env
    from sample_factory_tpu.envs.env_info import extract_env_info
    from sample_factory_tpu.models.actor_critic import create_actor_critic
    from sample_factory_tpu.runner.checkpoint import load_checkpoint

    env = make_grid_duel_env("grid_duel")
    env_info = extract_env_info(env, cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)
    eval_cfg = cfg
    eval_cfg.rollout = 96
    key = jax.random.PRNGKey(0)
    ss = init_mixed_sampler_state(eval_cfg, env, key, 128, 2)
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
        stacked, orms, ss, jnp.asarray([0, 1] * 128, jnp.int32), jnp.asarray([1, 0])
    )
    ep = jax.device_get(ep)
    avg0 = float(ep["raw_return_sum"][0]) / max(1.0, float(ep["count"][0]))
    avg1 = float(ep["raw_return_sum"][1]) / max(1.0, float(ep["count"][1]))
    result = {"exploit_trained_avg_return": round(avg0, 3), "exploit_fresh_avg_return": round(avg1, 3),
              "margin": round(avg0 - avg1, 3)}
    print("EXPLOIT_EVAL " + json.dumps(result))
    with open(join(args.train_dir, args.experiment, "exploit_eval.json"), "w") as f:
        json.dump(result, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
