"""Policy cores: multi-layer GRU/LSTM single-step cells, or identity.

Parity: reference `sample_factory/model/core.py` (ModelCoreRNN :19,
ModelCoreIdentity :67). TPU-native design: the core exposes a SINGLE-STEP
transition `(x, flat_state) -> (y, new_flat_state)`; sequence processing is
`lax.scan` over time with done-masked state resets in the rollout/learner code
(this replaces the reference's PackedSequence machinery,
`algo/learning/rnn_utils.py` — on TPU masking beats packing, SURVEY.md §7.7).

State layout matches the reference trajectory schema: one flat vector per
step, [B, rnn_num_layers * rnn_size * (2 if lstm)], LSTM as h||c per layer.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sample_factory_tpu.models.model_utils import rnn_state_size


class ModelCoreRNN(nn.Module):
    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, flat_state):
        """One step. x: [B, D_in]; flat_state: [B, S]. Returns (y, new_flat_state)."""
        num_layers = self.cfg.rnn_num_layers
        size = self.cfg.rnn_size
        is_lstm = self.cfg.rnn_type == "lstm"
        per_layer = size * (2 if is_lstm else 1)

        new_states = []
        inp = x
        for layer in range(num_layers):
            chunk = flat_state[:, layer * per_layer : (layer + 1) * per_layer]
            if is_lstm:
                h, c = chunk[:, :size], chunk[:, size:]
                cell = nn.OptimizedLSTMCell(size, dtype=self.dtype, name=f"lstm_{layer}")
                (new_c, new_h), out = cell((c, h), inp)
                new_states.append(jnp.concatenate([new_h, new_c], axis=-1))
            else:
                cell = nn.GRUCell(size, dtype=self.dtype, name=f"gru_{layer}")
                new_h, out = cell(chunk, inp)
                new_states.append(new_h)
            inp = out
        return inp, jnp.concatenate(new_states, axis=-1)


class ModelCoreIdentity(nn.Module):
    """No-op core for feed-forward policies (reference :67-77)."""

    cfg: Any
    dtype: Any = jnp.float32

    def __call__(self, x, flat_state):
        return x, flat_state


def default_make_core(cfg, dtype=jnp.float32) -> nn.Module:
    return ModelCoreRNN(cfg, dtype=dtype) if cfg.use_rnn else ModelCoreIdentity(cfg, dtype=dtype)


def initial_rnn_state(cfg, batch_size: int) -> jnp.ndarray:
    return jnp.zeros((batch_size, rnn_state_size(cfg)), jnp.float32)
