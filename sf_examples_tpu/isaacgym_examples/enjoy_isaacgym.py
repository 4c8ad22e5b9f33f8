"""Visualize an IsaacGym policy (parity: reference sf_examples/isaacgym_examples/enjoy_isaacgym.py)."""

from __future__ import annotations

import sys

from sample_factory_tpu.enjoy import enjoy
from sf_examples_tpu.isaacgym_examples.train_isaacgym import parse_isaacgym_args, register_isaacgym_components


def main() -> int:
    register_isaacgym_components()
    cfg = parse_isaacgym_args(evaluation=True)
    status, _ = enjoy(cfg)
    return status


if __name__ == "__main__":
    sys.exit(main())
