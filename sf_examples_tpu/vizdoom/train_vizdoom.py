"""Train on ViZDoom scenarios (parity: reference sf_examples/vizdoom/train_vizdoom.py).

Usage:
    python -m sf_examples_tpu.vizdoom.train_vizdoom --env=doom_battle --experiment=battle1
"""

from __future__ import annotations

import sys

from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
from sample_factory_tpu.train import run_rl
from sf_examples_tpu.vizdoom.doom_params import add_doom_env_args, doom_override_defaults
from sf_examples_tpu.vizdoom.doom_utils import register_vizdoom_components


def parse_vizdoom_cfg(argv=None, evaluation=False):
    parser, _ = parse_sf_args(argv, evaluation=evaluation)
    add_doom_env_args(parser)
    if evaluation:
        from sf_examples_tpu.vizdoom.doom_params import add_doom_env_eval_args

        add_doom_env_eval_args(parser)
    doom_override_defaults(parser)
    return parse_full_cfg(parser, argv)


def main() -> int:
    register_vizdoom_components()
    cfg = parse_vizdoom_cfg()
    return run_rl(cfg, register_fn=register_vizdoom_components)


if __name__ == "__main__":
    sys.exit(main())
