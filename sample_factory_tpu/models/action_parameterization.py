"""Action parameterization heads: FC producing distribution parameters.

Parity: reference `sample_factory/model/action_parameterization.py` —
ActionParameterizationDefault (:20) and the continuous non-adaptive-stddev
variant with a single learned log-std vector and optional tanh squashing
(:42-76).
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from sample_factory_tpu.envs.spaces import num_action_parameters
from sample_factory_tpu.models.model_utils import bias_initializer, kernel_initializer


class ActionParameterizationDefault(nn.Module):
    cfg: Any
    action_space: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, core_output):
        n = num_action_parameters(self.action_space)
        params = nn.Dense(
            n, kernel_init=kernel_initializer(self.cfg), bias_init=bias_initializer(self.cfg), dtype=self.dtype
        )(core_output)
        return params.astype(jnp.float32)


class ActionParameterizationContinuousNonAdaptiveStddev(nn.Module):
    """Means from the net, stddev a single learned parameter (reference :42-76)."""

    cfg: Any
    action_space: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, core_output):
        n = num_action_parameters(self.action_space)
        d = n // 2
        means = nn.Dense(
            d, kernel_init=kernel_initializer(self.cfg), bias_init=bias_initializer(self.cfg), dtype=self.dtype
        )(core_output).astype(jnp.float32)
        tanh_scale = self.cfg.continuous_tanh_scale
        if tanh_scale > 0:
            means = jnp.tanh(means / tanh_scale) * tanh_scale
        log_std = self.param(
            "learned_stddev", lambda key: jnp.full((d,), math.log(self.cfg.initial_stddev), jnp.float32)
        )
        log_std = jnp.broadcast_to(log_std, means.shape)
        return jnp.concatenate([means, log_std], axis=-1)
