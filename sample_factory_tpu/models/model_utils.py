"""Shared model building blocks: activations, initializers.

Parity: reference `sample_factory/model/model_utils.py` (nonlinearity,
create_mlp) and weight-init logic in `model/actor_critic.py:73-96`.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import orthogonal, variance_scaling, zeros


def nonlinearity(cfg) -> Callable:
    if cfg.nonlinearity == "elu":
        return nn.elu
    if cfg.nonlinearity == "relu":
        return nn.relu
    if cfg.nonlinearity == "tanh":
        return nn.tanh
    raise ValueError(f"Unknown nonlinearity {cfg.nonlinearity}")


def kernel_initializer(cfg):
    """orthogonal / xavier_uniform / framework default (reference actor_critic.py:73-96)."""
    gain = cfg.policy_init_gain
    if cfg.policy_initialization == "orthogonal":
        return orthogonal(scale=gain)
    if cfg.policy_initialization == "xavier_uniform":
        # xavier_uniform with gain: variance scaling, fan_avg, uniform
        return variance_scaling(scale=gain * gain, mode="fan_avg", distribution="uniform")
    # "torch_default": lecun-uniform-ish fan_in (close to torch's default kaiming_uniform)
    return variance_scaling(scale=1.0 / 3.0, mode="fan_in", distribution="uniform")


def bias_initializer(cfg):
    return zeros


def rnn_state_size(cfg) -> int:
    """Flat per-step RNN state width (reference model_utils.py:11-24: LSTM = h||c)."""
    if not cfg.use_rnn:
        return 1  # placeholder slot so trajectory schema is uniform
    mult = 2 if cfg.rnn_type == "lstm" else 1
    return cfg.rnn_size * cfg.rnn_num_layers * mult


def default_compute_dtype(cfg):
    return jnp.bfloat16 if getattr(cfg, "compute_dtype", "float32") == "bfloat16" else jnp.float32
