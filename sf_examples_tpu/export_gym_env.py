"""Export a trained gym-env policy as a portable StableHLO artifact.

Parity: reference `sf_examples/export_onnx_gym_env.py` — the reference exports
torch models to ONNX; the JAX-native portable serialization is StableHLO via
jax.export (see sample_factory_tpu/export_model.py), reloadable without the
framework or the original Python model code.

Usage (after training with train_gym_env):
    python -m sf_examples_tpu.export_gym_env --env=CartPole-v1 --experiment=cp1
"""

from __future__ import annotations

import functools
import sys

from sample_factory_tpu.export_model import export_model
from sf_examples_tpu.train_gym_env import parse_gym_args, register_gym_env


def main() -> int:
    cfg = parse_gym_args(evaluation=True)
    register_fn = functools.partial(register_gym_env, cfg.env)
    register_fn()
    path = export_model(cfg)
    print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
