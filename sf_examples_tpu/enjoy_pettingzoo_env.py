"""Visualize a trained PettingZoo policy.

Parity: reference `sf_examples/enjoy_pettingzoo_env.py`.
"""

from __future__ import annotations

import sys

from sample_factory_tpu.enjoy import enjoy
from sf_examples_tpu.train_pettingzoo_env import parse_custom_args, register_custom_components


def main() -> int:
    register_custom_components()
    cfg = parse_custom_args(evaluation=True)
    status, _ = enjoy(cfg)
    return status


if __name__ == "__main__":
    sys.exit(main())
