"""Train on DMLab (parity: reference sf_examples/dmlab/train_dmlab.py).

Usage:
    python -m sf_examples_tpu.dmlab.train_dmlab --env=dmlab_30 --experiment=dmlab30
"""

from __future__ import annotations

import sys

from sample_factory_tpu.algo.context import global_model_factory
from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
from sample_factory_tpu.train import make_rl_runner
from sf_examples_tpu.dmlab.dmlab_env import register_dmlab_envs
from sf_examples_tpu.dmlab.dmlab_model import make_dmlab_encoder
from sf_examples_tpu.dmlab.dmlab_params import add_dmlab_env_args, dmlab_override_defaults


def register_dmlab_components() -> None:
    register_dmlab_envs()
    global_model_factory().register_encoder_factory(make_dmlab_encoder)


def parse_dmlab_args(argv=None, evaluation=False):
    parser, partial_cfg = parse_sf_args(argv, evaluation=evaluation)
    add_dmlab_env_args(partial_cfg.env, parser)
    dmlab_override_defaults(partial_cfg.env, parser)
    return parse_full_cfg(parser, argv)


def main() -> int:
    register_dmlab_components()
    cfg = parse_dmlab_args()

    cfg, runner = make_rl_runner(cfg, register_fn=register_dmlab_components)
    if cfg.env == "dmlab_30":
        # human-normalized DMLab-30 scoring (IMPALA procedure)
        from sf_examples_tpu.dmlab.dmlab_summaries import Dmlab30ScoreTracker

        tracker = Dmlab30ScoreTracker(cfg)
        runner.register_episodic_stats_handler(tracker.on_episode_extra_stats)
        runner.register_observer(tracker)
    runner.init()
    return runner.run()


if __name__ == "__main__":
    sys.exit(main())
