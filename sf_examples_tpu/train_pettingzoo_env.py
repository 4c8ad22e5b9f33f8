"""Train on a PettingZoo env (tictactoe_v3) with a custom conv encoder.

Parity: reference `sf_examples/train_pettingzoo_env.py` — a turn-based
PettingZoo classic game converted to a parallel env, trained through the
multi-agent host pipeline with a user-registered encoder (the reference
registers a torch CustomConvEncoder via the global model factory; here the
custom encoder is a flax module over the dict observation {obs, action_mask},
NHWC, registered the same way).

Usage:
    python -m sf_examples_tpu.train_pettingzoo_env --env=tictactoe_v3 \
        --experiment=ttt --use_rnn=False --recurrence=1 --batch_size=512
    python -m sf_examples_tpu.enjoy_pettingzoo_env --env=tictactoe_v3 --experiment=ttt
"""

from __future__ import annotations

import sys
from typing import Optional

from flax import linen as nn

from sample_factory_tpu.algo.context import global_model_factory
from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
from sample_factory_tpu.envs.env_utils import register_env
from sample_factory_tpu.models.model_utils import kernel_initializer, nonlinearity
from sample_factory_tpu.train import run_rl


class CustomConvEncoder(nn.Module):
    """Small all-convolutional encoder for tiny board observations.

    Same role as the reference's CustomConvEncoder (train_pettingzoo_env.py):
    board planes -> conv stack -> MLP, with the action mask left for the
    distribution layer (masked categorical) rather than the encoder.
    """

    cfg: object
    obs_space: object

    @nn.compact
    def __call__(self, obs_dict):
        act = nonlinearity(self.cfg)
        x = obs_dict["obs"]
        batch_dims = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        for out_ch in (32, 64, 128):
            x = nn.Conv(out_ch, (2, 2), padding="VALID", kernel_init=kernel_initializer(self.cfg))(x)
            x = act(x)
        x = x.reshape(batch_dims + (-1,))
        for size in self.cfg.encoder_conv_mlp_layers:
            x = nn.Dense(size, kernel_init=kernel_initializer(self.cfg))(x)
            x = act(x)
        return x


def make_pettingzoo_classic(full_env_name: str, cfg=None, env_config=None, render_mode: Optional[str] = None):
    from sample_factory_tpu.envs.pettingzoo_adapter import make_pettingzoo_env

    return make_pettingzoo_env(f"pettingzoo.classic.{full_env_name}", parallel=False)


def register_custom_components() -> None:
    register_env("tictactoe_v3", make_pettingzoo_classic)
    global_model_factory().register_encoder_factory(lambda cfg, obs_space: CustomConvEncoder(cfg, obs_space))


def override_defaults(parser) -> None:
    parser.set_defaults(
        env="tictactoe_v3",
        use_rnn=False,
        recurrence=1,
        with_vtrace=False,
        batched_sampling=True,
        num_workers=2,
        num_envs_per_worker=10,
        worker_num_splits=2,
        rollout=16,
        batch_size=512,
        encoder_conv_mlp_layers=[128],
        train_for_env_steps=200_000,
        save_every_sec=10,
        experiment_summaries_interval=10,
    )


def parse_custom_args(argv=None, evaluation=False):
    parser, cfg = parse_sf_args(argv, evaluation=evaluation)
    override_defaults(parser)
    return parse_full_cfg(parser, argv)


def main() -> int:
    register_custom_components()
    cfg = parse_custom_args()
    return run_rl(cfg, register_fn=register_custom_components)


if __name__ == "__main__":
    sys.exit(main())
