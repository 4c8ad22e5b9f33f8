"""Train on MuJoCo (gymnasium) tasks.

Parity: reference `sf_examples/mujoco/train_mujoco.py`.
Usage:
    python -m sf_examples_tpu.mujoco.train_mujoco --env=mujoco_halfcheetah --experiment=hc1
"""

from __future__ import annotations

import sys

from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
from sample_factory_tpu.train import run_rl
from sf_examples_tpu.mujoco.mujoco_params import add_mujoco_env_args, mujoco_override_defaults
from sf_examples_tpu.mujoco.mujoco_utils import register_mujoco_components


def parse_mujoco_cfg(argv=None, evaluation=False):
    parser, partial_cfg = parse_sf_args(argv, evaluation=evaluation)
    add_mujoco_env_args(partial_cfg.env, parser)
    mujoco_override_defaults(partial_cfg.env, parser)
    return parse_full_cfg(parser, argv)


def main() -> int:
    register_mujoco_components()
    cfg = parse_mujoco_cfg()
    return run_rl(cfg, register_fn=register_mujoco_components)


if __name__ == "__main__":
    sys.exit(main())
