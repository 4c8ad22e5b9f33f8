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
    def __call__(self, x, flat_state, resets=None, seq: bool = False):
        """Step mode: x [B, D_in], flat_state [B, S] -> (y, new_state).
        Sequence mode (seq=True): x [T, B, D_in], resets [T, B] ->
        (y [T, B, H], final_state [B, S]) — fused scan per layer
        (ops/rnn_cells.py), replacing the per-step two-matmul pattern."""
        from sample_factory_tpu.ops.rnn_cells import FusedGRUCell, FusedLSTMCell

        num_layers = self.cfg.rnn_num_layers
        size = self.cfg.rnn_size
        is_lstm = self.cfg.rnn_type == "lstm"
        per_layer = size * (2 if is_lstm else 1)

        new_states = []
        inp = x
        for layer in range(num_layers):
            chunk = flat_state[:, layer * per_layer : (layer + 1) * per_layer]
            if is_lstm:
                cell = FusedLSTMCell(size, self.cfg, dtype=self.dtype, name=f"lstm_{layer}")
            else:
                cell = FusedGRUCell(size, self.cfg, dtype=self.dtype, name=f"gru_{layer}")
            out, new_state = cell(inp, chunk, resets=resets, seq=seq)
            new_states.append(new_state)
            inp = out
        return inp, jnp.concatenate(new_states, axis=-1)


class ModelCoreIdentity(nn.Module):
    """No-op core for feed-forward policies (reference :67-77)."""

    cfg: Any
    dtype: Any = jnp.float32

    def __call__(self, x, flat_state, resets=None, seq: bool = False):
        return x, flat_state


def default_make_core(cfg, dtype=jnp.float32) -> nn.Module:
    return ModelCoreRNN(cfg, dtype=dtype) if cfg.use_rnn else ModelCoreIdentity(cfg, dtype=dtype)


def initial_rnn_state(cfg, batch_size: int) -> jnp.ndarray:
    return jnp.zeros((batch_size, rnn_state_size(cfg)), jnp.float32)
