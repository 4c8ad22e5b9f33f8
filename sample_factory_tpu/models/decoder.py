"""Optional MLP decoder between core and heads.

Parity: reference `sample_factory/model/decoder.py` (MlpDecoder :15).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from sample_factory_tpu.models.model_utils import bias_initializer, kernel_initializer, nonlinearity


class MlpDecoder(nn.Module):
    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = nonlinearity(self.cfg)
        for size in self.cfg.decoder_mlp_layers:
            x = nn.Dense(size, kernel_init=kernel_initializer(self.cfg), bias_init=bias_initializer(self.cfg), dtype=self.dtype)(x)
            x = act(x)
        return x


def default_make_decoder(cfg, dtype=jnp.float32) -> nn.Module:
    return MlpDecoder(cfg, dtype=dtype)
