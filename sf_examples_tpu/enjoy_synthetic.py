"""Evaluate a policy trained by train_synthetic.py."""

from __future__ import annotations

import sys

from sample_factory_tpu.enjoy import enjoy
from sf_examples_tpu.train_synthetic import parse_custom_args, register_synthetic_components


def main() -> int:
    register_synthetic_components()
    cfg = parse_custom_args(evaluation=True)
    status, _ = enjoy(cfg)
    return status


if __name__ == "__main__":
    sys.exit(main())
