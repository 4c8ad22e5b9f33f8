"""Train on the built-in synthetic test envs (the analog of the reference's
`sf_examples/train_custom_env_custom_model.py` smoke-test harness).

Usage:
    python -m sf_examples_tpu.train_synthetic --env=synthetic_vector_discrete \
        --experiment=t1 --train_for_env_steps=100000
"""

from __future__ import annotations

import sys

from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args
from sample_factory_tpu.envs.builtin.synthetic import make_synthetic_env
from sample_factory_tpu.envs.env_utils import register_env
from sample_factory_tpu.train import run_rl


def add_extra_params(parser):
    p = parser
    p.add_argument("--custom_env_num_actions", default=10, type=int, help="Number of actions in the synthetic env")
    p.add_argument("--custom_env_episode_len", default=16, type=int, help="Episode length of the synthetic env")


def override_defaults(parser):
    parser.set_defaults(
        use_rnn=False,
        batched_sampling=True,
        num_workers=4,
        num_envs_per_worker=16,
        rollout=32,
        recurrence=-1,
        batch_size=1024,
        encoder_mlp_layers=[128, 128],
        train_for_env_steps=100_000,
        save_every_sec=30,
        experiment_summaries_interval=5,
    )


def register_synthetic_components():
    for name in ("synthetic_discrete", "synthetic_vector_discrete", "synthetic_continuous", "synthetic_tuple", "synthetic_masked", "grid_battle", "grid_battle_small"):
        register_env(name, make_synthetic_env)
    # on-device physics ant (the IsaacGym-Ant analog; envs/builtin/ant.py)
    from sample_factory_tpu.envs.builtin.ant import register_ant

    register_ant("ant")
    register_ant("ant_short")
    # on-device 2-agent self-play duel (the doom-duel analog)
    from sample_factory_tpu.envs.builtin.grid_duel import register_grid_duel

    register_grid_duel()


def parse_custom_args(argv=None, evaluation=False):
    parser, cfg = parse_sf_args(argv, evaluation=evaluation)
    add_extra_params(parser)
    override_defaults(parser)
    return parse_full_cfg(parser, argv)


def main() -> int:
    register_synthetic_components()
    cfg = parse_custom_args()
    return run_rl(cfg)


if __name__ == "__main__":
    sys.exit(main())
