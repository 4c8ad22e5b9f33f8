"""Train on NetHack (parity: reference sf_examples/nethack/train_nethack.py).

Usage:
    python -m sf_examples_tpu.nethack.train_nethack --env=nethack_challenge --experiment=nh1
"""

from __future__ import annotations

import sys

from sample_factory_tpu.algo.context import global_model_factory
from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
from sample_factory_tpu.train import run_rl
from sf_examples_tpu.nethack.models import make_nethack_encoder
from sf_examples_tpu.nethack.nethack_env import register_nethack_envs
from sf_examples_tpu.nethack.nethack_params import (
    add_nethack_env_args,
    add_nethack_model_args,
    nethack_override_defaults,
)


def register_nethack_components() -> None:
    register_nethack_envs()
    global_model_factory().register_encoder_factory(make_nethack_encoder)


def parse_nethack_args(argv=None, evaluation=False):
    parser, partial_cfg = parse_sf_args(argv, evaluation=evaluation)
    add_nethack_env_args(partial_cfg.env, parser)
    add_nethack_model_args(partial_cfg.env, parser)
    nethack_override_defaults(partial_cfg.env, parser)
    return parse_full_cfg(parser, argv)


def main() -> int:
    register_nethack_components()
    cfg = parse_nethack_args()
    return run_rl(cfg, register_fn=register_nethack_components)


if __name__ == "__main__":
    sys.exit(main())
