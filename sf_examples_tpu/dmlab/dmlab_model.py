"""DMLab policy encoder: pixels + natural-language instructions.

Behavioral parity with reference `sf_examples/dmlab/dmlab_model.py` (the
IMPALA language-conditioned architecture): image encoder over the RGB obs,
word-embedding (dim 20, padding id 0) + single-layer 64-unit LSTM over the
instruction tokens, last-valid-step LSTM output concatenated with the image
features.

TPU-native redesign: the reference packs variable-length instructions with
torch PackedSequence and pins the embedding/LSTM to CPU; here the instruction
axis is a fixed 16-step `lax.scan` with length masking — static shapes, fully
fused on device with the conv encoder (masking beats packing on TPU,
SURVEY.md §5 long-context notes).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from sample_factory_tpu.models.encoder import make_img_encoder
from sample_factory_tpu.models.model_utils import default_compute_dtype
from sf_examples_tpu.dmlab.dmlab30 import DMLAB_INSTRUCTIONS, DMLAB_VOCABULARY_SIZE

INSTRUCTION_EMBED_DIM = 20
INSTRUCTION_LSTM_UNITS = 64


class InstructionEncoder(nn.Module):
    """Embedding + masked LSTM over a fixed-length [B, L] int token axis.

    Returns the LSTM output at the last non-padding position (zeros for an
    empty instruction after the mandatory min-length-1 clamp, matching the
    reference's clamped pack_padded_sequence behavior)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        from sample_factory_tpu.ops.rnn_cells import FusedLSTMCell

        B, L = tokens.shape
        embed = nn.Embed(DMLAB_VOCABULARY_SIZE, INSTRUCTION_EMBED_DIM, dtype=self.dtype)(tokens)
        # padding id 0 embeds to zero (torch Embedding padding_idx semantics)
        valid = (tokens != 0).astype(self.dtype)  # [B, L]
        embed = embed * valid[..., None]

        lengths = jnp.maximum(jnp.sum(tokens != 0, axis=1), 1)  # [B], min 1

        # fused-scan LSTM over the token axis (ops/rnn_cells.py: one big MXU
        # input projection, only the recurrent half inside the scan)
        cell = FusedLSTMCell(INSTRUCTION_LSTM_UNITS, dtype=self.dtype)
        h0 = jnp.zeros((B, 2 * INSTRUCTION_LSTM_UNITS), jnp.float32)
        no_resets = jnp.zeros((L, B), jnp.float32)
        outputs, _ = cell(jnp.swapaxes(embed, 0, 1), h0, resets=no_resets, seq=True)  # [L, B, H]
        outputs = jnp.swapaxes(outputs, 0, 1).astype(self.dtype)  # [B, L, H]
        last_idx = (lengths - 1)[:, None, None]  # [B, 1, 1]
        last = jnp.take_along_axis(outputs, jnp.broadcast_to(last_idx, (B, 1, outputs.shape[-1])), axis=1)
        return last[:, 0, :]  # [B, H]


class DmlabEncoder(nn.Module):
    """Image encoder ++ instruction LSTM output (reference dmlab_model.py:60-87)."""

    cfg: Any
    obs_space: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        x = make_img_encoder(self.cfg, self.dtype, name="enc_obs")(obs_dict["obs"])
        if DMLAB_INSTRUCTIONS in obs_dict:
            instr = InstructionEncoder(dtype=self.dtype, name="enc_instr")(
                obs_dict[DMLAB_INSTRUCTIONS].astype(jnp.int32)
            )
            x = jnp.concatenate([x, instr.astype(x.dtype)], axis=-1)
        return x


def make_dmlab_encoder(cfg, obs_space) -> nn.Module:
    return DmlabEncoder(cfg, obs_space, dtype=default_compute_dtype(cfg))
