"""Visualize/evaluate a NetHack policy (parity: reference sf_examples/nethack/enjoy_nethack.py)."""

from __future__ import annotations

import sys

from sample_factory_tpu.enjoy import enjoy
from sf_examples_tpu.nethack.train_nethack import parse_nethack_args, register_nethack_components


def main() -> int:
    register_nethack_components()
    cfg = parse_nethack_args(evaluation=True)
    status, _ = enjoy(cfg)
    return status


if __name__ == "__main__":
    sys.exit(main())
