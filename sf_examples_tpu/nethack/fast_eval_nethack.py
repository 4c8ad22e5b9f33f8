"""Fast parallel NetHack evaluation -> CSV (parity: reference
sf_examples/nethack/fast_eval_nethack.py, which wraps sample_factory.eval)."""

from __future__ import annotations

import sys

from sample_factory_tpu.eval import do_eval
from sf_examples_tpu.nethack.train_nethack import parse_nethack_args, register_nethack_components


def main() -> int:
    register_nethack_components()
    cfg = parse_nethack_args(evaluation=True)
    return do_eval(cfg, register_fn=register_nethack_components)


if __name__ == "__main__":
    sys.exit(main())
