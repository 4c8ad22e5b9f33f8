"""Brax on-device envs: physics and policy fused into one XLA program.

Parity: reference `sf_examples/brax/train_brax.py` (env list + tuned defaults
:160-204 kept value-for-value; the published Brax returns in BASELINE.md used
them). On TPU this is the flagship regime: a Brax env IS a jittable
reset/step pair, so it plugs straight into the DeviceEnv sampler — the entire
iteration (sample 32xN steps -> learn) is one compiled program. Gated on brax
availability.

Usage:
    python -m sf_examples_tpu.brax.train_brax --env=brax_ant --experiment=ant1
"""

from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp

from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
from sample_factory_tpu.envs.device_env import DeviceEnv
from sample_factory_tpu.envs.env_utils import register_env
from sample_factory_tpu.envs.spaces import Box, make_dict_spec
from sample_factory_tpu.train import run_rl

BRAX_ENVS = {
    "brax_ant": "ant",
    "brax_humanoid": "humanoid",
    "brax_halfcheetah": "halfcheetah",
    "brax_walker2d": "walker2d",
    "brax_hopper": "hopper",
    "brax_reacher": "reacher",
    "brax_pusher": "pusher",
    "brax_inverted_pendulum": "inverted_pendulum",
    "brax_inverted_double_pendulum": "inverted_double_pendulum",
}


def brax_available() -> bool:
    try:
        import brax  # noqa: F401

        return True
    except ImportError:
        return False


class BraxDeviceEnv(DeviceEnv):
    """Adapter: brax.envs.Env -> DeviceEnv (single instance; sampler vmaps)."""

    def __init__(self, brax_env_name: str, episode_len: int = 1000):
        from brax import envs as brax_envs

        self._env = brax_envs.get_environment(brax_env_name)
        self.episode_len = episode_len
        self.obs_space = make_dict_spec({"obs": Box((self._env.observation_size,))})
        self.action_space = Box((self._env.action_size,), -1.0, 1.0)

    def reset(self, key):
        state = self._env.reset(key)
        return {"obs": state.obs}, {"brax": state, "steps": jnp.zeros((), jnp.int32)}

    def step(self, key, state, action):
        brax_state = self._env.step(state["brax"], action)
        steps = state["steps"] + 1
        terminated = brax_state.done.astype(bool)
        truncated = steps >= self.episode_len
        return (
            {"obs": brax_state.obs},
            {"brax": brax_state, "steps": steps},
            brax_state.reward.astype(jnp.float32),
            terminated,
            truncated,
            {},
        )


def make_brax_env(env_name: str, cfg=None, env_config=None, render_mode: Optional[str] = None):
    if not brax_available():
        raise RuntimeError("brax is not installed; pip install brax")
    return BraxDeviceEnv(BRAX_ENVS[env_name])


def register_brax_components() -> None:
    for name in BRAX_ENVS:
        register_env(name, make_brax_env)


def add_extra_params(parser):
    parser.add_argument("--env_agents", default=2048, type=int, help="Number of vectorized brax env instances")


def override_default_params(parser):
    parser.set_defaults(
        batched_sampling=True,
        num_workers=1,
        num_envs_per_worker=1,
        worker_num_splits=1,
        train_for_env_steps=100_000_000,
        use_rnn=False,
        adaptive_stddev=False,
        policy_initialization="torch_default",
        reward_scale=0.01,
        max_grad_norm=1.0,
        rollout=32,
        batch_size=32768,
        num_batches_per_epoch=2,
        num_epochs=5,
        ppo_clip_ratio=0.2,
        ppo_clip_value=1.0,
        value_loss_coeff=2.0,
        exploration_loss_coeff=0.0,
        nonlinearity="elu",
        encoder_mlp_layers=[256, 128, 64],
        actor_critic_share_weights=True,
        learning_rate=3e-4,
        lr_schedule="kl_adaptive_epoch",
        lr_schedule_kl_threshold=0.008,
        lr_adaptive_max=2e-3,
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
        experiment_summaries_interval=3,
    )


def parse_brax_cfg(argv=None, evaluation=False):
    parser, partial_cfg = parse_sf_args(argv, evaluation=evaluation)
    add_extra_params(parser)
    override_default_params(parser)
    cfg = parse_full_cfg(parser, argv)
    cfg.num_envs = cfg.env_agents  # brax convention: one very vectorized env
    return cfg


def main() -> int:
    register_brax_components()
    cfg = parse_brax_cfg()
    return run_rl(cfg)


if __name__ == "__main__":
    sys.exit(main())
