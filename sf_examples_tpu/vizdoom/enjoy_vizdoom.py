"""Visualize/evaluate a trained Doom policy (parity: reference
sf_examples/vizdoom/enjoy_vizdoom.py)."""

from __future__ import annotations

import sys

from sample_factory_tpu.enjoy import enjoy
from sf_examples_tpu.vizdoom.doom_utils import register_vizdoom_components
from sf_examples_tpu.vizdoom.train_vizdoom import parse_vizdoom_cfg


def main() -> int:
    register_vizdoom_components()
    cfg = parse_vizdoom_cfg(evaluation=True)
    status, _ = enjoy(cfg)
    return status


if __name__ == "__main__":
    sys.exit(main())
