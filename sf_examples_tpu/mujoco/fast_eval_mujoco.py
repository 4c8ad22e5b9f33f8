"""Fast parallel evaluation -> CSV (parity: reference
sf_examples/mujoco/fast_eval_mujoco.py)."""

from __future__ import annotations

import sys

from sample_factory_tpu.eval import do_eval
from sf_examples_tpu.mujoco.mujoco_utils import register_mujoco_components
from sf_examples_tpu.mujoco.train_mujoco import parse_mujoco_cfg


def main() -> int:
    register_mujoco_components()
    cfg = parse_mujoco_cfg(evaluation=True)
    return do_eval(cfg, register_fn=register_mujoco_components)


if __name__ == "__main__":
    sys.exit(main())
