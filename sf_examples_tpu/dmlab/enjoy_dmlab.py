"""Visualize/evaluate a DMLab policy (parity: reference sf_examples/dmlab/enjoy_dmlab.py)."""

from __future__ import annotations

import sys

from sample_factory_tpu.enjoy import enjoy
from sf_examples_tpu.dmlab.train_dmlab import parse_dmlab_args, register_dmlab_components


def main() -> int:
    register_dmlab_components()
    cfg = parse_dmlab_args(evaluation=True)
    status, _ = enjoy(cfg)
    return status


if __name__ == "__main__":
    sys.exit(main())
