"""Evaluate a policy trained on a custom VizDoom scenario
(parity: reference sf_examples/vizdoom/enjoy_custom_vizdoom_env.py)."""

from __future__ import annotations

import sys

from sample_factory_tpu.enjoy import enjoy
from sf_examples_tpu.vizdoom.doom_utils import register_vizdoom_components
from sf_examples_tpu.vizdoom.train_custom_vizdoom_env import parse_custom_doom_cfg, register_custom_doom_env


def main() -> int:
    register_vizdoom_components()
    cfg = parse_custom_doom_cfg(evaluation=True)
    if not cfg.custom_doom_cfg:
        raise ValueError("--custom_doom_cfg=/abs/path/to/scenario.cfg is required")
    register_custom_doom_env(cfg.custom_doom_cfg, cfg.custom_doom_timeout)
    status, _ = enjoy(cfg)
    return status


if __name__ == "__main__":
    sys.exit(main())
