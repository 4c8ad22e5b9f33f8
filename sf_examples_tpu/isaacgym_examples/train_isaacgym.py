"""IsaacGym Envs integration (gated on the isaacgym/isaacgymenvs packages).

Parity: reference `sf_examples/isaacgym_examples/train_isaacgym.py` — env
construction through the IGE hydra configs, the obs/states key selection, and
the per-task tuned hyperparameters (kept value-for-value; they produced the
published IsaacGym returns in BASELINE.md).

TPU reality check: IsaacGym's PhysX simulation only runs on NVIDIA GPUs. On a
machine that has one, this adapter feeds the sim's batched observations
through the host pipeline (GPU sim -> host numpy -> TPU learner). On pure TPU
fleets the equivalent massively-parallel regime is the on-device env path —
`sf_examples_tpu.brax.train_brax` and the synthetic physics envs — where env
and learner fuse into one XLA program (that configuration is this framework's
IsaacGym-Ant benchmark in BASELINE.md/bench.py).
"""

from __future__ import annotations

import sys
from typing import Optional

from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
from sample_factory_tpu.train import run_rl
from sample_factory_tpu.utils.utils import log, str2bool


def isaacgym_available() -> bool:
    try:
        import isaacgym  # noqa: F401
        import isaacgymenvs  # noqa: F401

        return True
    except ImportError:
        return False


# IGE task names (match IGE config file names); each gets tuned defaults below
ISAACGYM_ENVS = [
    "Ant",
    "Anymal",
    "AnymalTerrain",
    "BallBalance",
    "Cartpole",
    "ShadowHand",
    "Humanoid",
    "AllegroHand",
    "AllegroHandLSTM",
]


class IsaacGymBatchedEnv:
    """Batched vectorized adapter: one IGE sim with N parallel agents exposed
    through the host multi-agent convention (num_agents = sim envs); torch
    GPU tensors are converted at the host boundary."""

    is_multiagent = True

    def __init__(self, ige_env, obs_key: str):
        import gymnasium as gym
        import numpy as np
        import torch  # noqa: F401

        self.env = ige_env
        self.num_agents = self.env.num_envs
        self.obs_key = obs_key
        space = self.env.state_space if obs_key == "states" else self.env.observation_space
        self.observation_space = gym.spaces.Dict(
            {"obs": gym.spaces.Box(-np.inf, np.inf, tuple(space.shape), np.float32)}
        )
        self.action_space = gym.spaces.Box(-1.0, 1.0, tuple(self.env.action_space.shape), np.float32)

    def _obs_list(self, obs_dict):
        import numpy as np

        obs = obs_dict[self.obs_key if self.obs_key in obs_dict else "obs"]
        obs_np = np.asarray(obs.cpu().numpy(), np.float32)
        return [{"obs": obs_np[i]} for i in range(self.num_agents)]

    def reset(self, *args, **kwargs):
        obs_dict = self.env.reset()
        return self._obs_list(obs_dict), [{} for _ in range(self.num_agents)]

    def step(self, action_list):
        import numpy as np
        import torch

        actions = torch.from_numpy(np.stack(action_list)).to(self.env.device)
        obs, rew, terminated, infos = self.env.step(actions)
        truncated = infos.get("time_outs") if isinstance(infos, dict) else None
        rew_np = rew.cpu().numpy()
        term_np = terminated.cpu().numpy().astype(bool)
        trunc_np = truncated.cpu().numpy().astype(bool) if truncated is not None else np.zeros_like(term_np)
        info_list = [{} for _ in range(self.num_agents)]
        return self._obs_list(obs), list(rew_np), list(term_np), list(trunc_np), info_list

    def render(self):
        pass

    def close(self):
        pass


def make_isaacgym_env(full_env_name: str, cfg=None, env_config=None, render_mode: Optional[str] = None):
    if not isaacgym_available():
        raise RuntimeError(
            "isaacgym/isaacgymenvs are not installed (NVIDIA-GPU-only simulator). On TPU use the "
            "on-device massively-parallel envs instead: sf_examples_tpu.brax.train_brax or "
            "sf_examples_tpu.train_synthetic (the IsaacGym-Ant-like benchmark regime)."
        )
    import os
    from os.path import join

    import isaacgymenvs
    from hydra import compose, initialize
    from isaacgymenvs.tasks import isaacgym_task_map
    from isaacgymenvs.utils.reformat import omegaconf_to_dict

    task_name = full_env_name.split("isaacgym_")[-1] if full_env_name.startswith("isaacgym_") else full_env_name
    overrides = [f"task={task_name}"]
    if cfg.env_agents > 0:
        overrides.append(f"num_envs={cfg.env_agents}")
    if cfg.subtask is not None:
        overrides.append(f"task/env={cfg.subtask}")

    cfg_dir = os.path.relpath(join(isaacgymenvs.__path__[0], "cfg"), os.path.dirname(os.path.abspath(__file__)))
    initialize(config_path=cfg_dir, job_name="sftpu_isaacgym")
    ige_cfg = compose(config_name="config", overrides=overrides)
    task_cfg = omegaconf_to_dict(ige_cfg)["task"]

    make_env = isaacgym_task_map[task_cfg["name"]]
    env = make_env(
        cfg=task_cfg,
        sim_device=ige_cfg.sim_device,
        rl_device=ige_cfg.rl_device,
        graphics_device_id=ige_cfg.graphics_device_id,
        headless=render_mode != "human",
        virtual_screen_capture=False,
        force_render=render_mode == "human",
    )
    return IsaacGymBatchedEnv(env, cfg.obs_key)


def register_isaacgym_envs() -> None:
    from sample_factory_tpu.envs.env_utils import register_env

    for name in ISAACGYM_ENVS:
        register_env(name, make_isaacgym_env)
    if not isaacgym_available():
        log.debug("isaacgym not installed; envs registered but will raise on creation")


def add_isaacgym_env_args(_env, parser):
    p = parser
    p.add_argument("--env_agents", default=-1, type=int, help="Sim agents per env (-1 = IGE yaml default)")
    p.add_argument("--obs_key", default="obs", type=str, help="'obs' (deployable obs) or 'states' (full sim state)")
    p.add_argument("--subtask", default=None, type=str, help="Subtask for envs that support it (AllegroKuka)")
    p.add_argument("--eval_stats", default=False, type=str2bool, help="Collect env stats during evaluation")


# per-task tuned hyperparameters (reference train_isaacgym.py env_configs)
ENV_CONFIGS = dict(
    Ant=dict(encoder_mlp_layers=[256, 128, 64], experiment_summaries_interval=3, save_every_sec=15),
    Anymal=dict(
        train_for_env_steps=1_310_000_000, encoder_mlp_layers=[256, 128, 64], num_epochs=5,
        max_grad_norm=1.0, num_batches_per_epoch=4, exploration_loss_coeff=0.0,
    ),
    AnymalTerrain=dict(
        train_for_env_steps=1_310_000_000, encoder_mlp_layers=[256, 128, 64], num_epochs=5,
        max_grad_norm=1.0, num_batches_per_epoch=4, exploration_loss_coeff=0.001,
    ),
    BallBalance=dict(
        train_for_env_steps=1_310_000_000, encoder_mlp_layers=[128, 64, 32], num_epochs=5,
        max_grad_norm=1.0, num_batches_per_epoch=8, exploration_loss_coeff=0.0,
    ),
    Cartpole=dict(
        train_for_env_steps=1_310_000_000, encoder_mlp_layers=[128, 64, 32], num_epochs=5,
        max_grad_norm=1.0, num_batches_per_epoch=8, exploration_loss_coeff=0.0,
    ),
    ShadowHand=dict(
        train_for_env_steps=1_310_000_000, encoder_mlp_layers=[512, 512, 256, 128], learning_rate=5e-4,
        lr_schedule_kl_threshold=0.016, num_epochs=5, max_grad_norm=1.0, num_batches_per_epoch=8,
    ),
    Humanoid=dict(
        train_for_env_steps=1_310_000_000, encoder_mlp_layers=[400, 200, 100], rollout=32, num_epochs=5,
        value_loss_coeff=4.0, max_grad_norm=1.0, num_batches_per_epoch=4,
        experiment_summaries_interval=3, save_every_sec=15,
    ),
    AllegroHand=dict(
        train_for_env_steps=10_000_000_000, encoder_mlp_layers=[512, 256, 128], learning_rate=5e-3,
        lr_schedule_kl_threshold=0.02, reward_scale=0.01, num_epochs=4, max_grad_norm=1.0,
        num_batches_per_epoch=8,
    ),
    AllegroHandLSTM=dict(
        train_for_env_steps=10_000_000_000, encoder_mlp_layers=[512, 256, 128], use_rnn=True,
        rnn_type="lstm", learning_rate=1e-4, lr_schedule_kl_threshold=0.016, reward_scale=0.01,
        num_epochs=4, max_grad_norm=1.0, num_batches_per_epoch=8, obs_key="states",
    ),
)


def isaacgym_override_defaults(env, parser):
    parser.set_defaults(
        batched_sampling=True,
        num_workers=1,
        num_envs_per_worker=1,
        worker_num_splits=1,
        train_for_env_steps=10_000_000,
        use_rnn=False,
        adaptive_stddev=False,
        reward_scale=0.01,
        rollout=16,
        max_grad_norm=0.0,
        batch_size=32768,
        num_batches_per_epoch=2,
        num_epochs=4,
        ppo_clip_ratio=0.2,
        value_loss_coeff=2.0,
        exploration_loss_coeff=0.0,
        nonlinearity="elu",
        learning_rate=3e-4,
        lr_schedule="kl_adaptive_epoch",
        lr_schedule_kl_threshold=0.008,
        shuffle_minibatches=False,
        gamma=0.99,
        gae_lambda=0.95,
        with_vtrace=False,
        value_bootstrap=True,
        normalize_input=True,
        normalize_returns=True,
        save_best_after=int(5e6),
        serial_mode=True,
        async_rl=False,
        use_env_info_cache=True,
    )
    if env in ENV_CONFIGS:
        parser.set_defaults(**ENV_CONFIGS[env])


def register_isaacgym_components() -> None:
    register_isaacgym_envs()


def parse_isaacgym_args(argv=None, evaluation=False):
    parser, partial_cfg = parse_sf_args(argv, evaluation=evaluation)
    add_isaacgym_env_args(partial_cfg.env, parser)
    isaacgym_override_defaults(partial_cfg.env, parser)
    return parse_full_cfg(parser, argv)


def main() -> int:
    register_isaacgym_components()
    cfg = parse_isaacgym_args()
    return run_rl(cfg, register_fn=register_isaacgym_components)


if __name__ == "__main__":
    sys.exit(main())
