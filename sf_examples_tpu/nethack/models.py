"""NetHack policy encoders in JAX/flax.

Behavioral parity with reference `sf_examples/nethack/models/`:

- ChaoticDwarvenGPT5 (nle-sample-factory-baseline): topline one-hot MLP,
  bottom-2-lines char/digit-channel 1D conv, screen-image conv stack,
  prev-action one-hot.
- ScaledNet ("Scaling Laws for Imitation Learning in NetHack",
  arXiv:2307.09423): char+color embeddings of the tty map, IMPALA-style
  conv/resnet trunk, cursor-centered crop branch, wide fc head.

TPU-native differences: NHWC layout throughout; the crop is a vmapped
`lax.dynamic_slice` over a zero-padded map (no grid_sample); ScaledNet's
BatchNorm is replaced with GroupNorm — running batch statistics do not fit
the pure-functional jitted train step, and GroupNorm is the standard
stateless substitution. All dims are derived from the obs space rather than
engine constants so the models build without nle installed.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_CHARS = 256
NUM_COLORS = 128


def _elu_mlp(x, sizes: Sequence[int], dtype, name_prefix: str):
    for i, size in enumerate(sizes):
        x = nn.Dense(size, dtype=dtype, name=f"{name_prefix}_fc{i}")(x)
        x = nn.elu(x)
    return x


class TopLineEncoder(nn.Module):
    """One-hot(256) of the top tty line -> 2-layer MLP (reference
    chaotic_dwarf.py:109-125). The one-hot matmul IS the embedding lookup,
    expressed as a single MXU-friendly [B, W*256] x [W*256, H] product."""

    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, topline: jnp.ndarray) -> jnp.ndarray:  # [B, W] int
        B = topline.shape[0]
        x = jax.nn.one_hot(topline.astype(jnp.int32), NUM_CHARS, dtype=self.dtype).reshape(B, -1)
        return _elu_mlp(x, [self.hidden, self.hidden], self.dtype, "msg")


class BottomLinesEncoder(nn.Module):
    """Bottom two tty lines -> (char, digit) channels -> 1D convs -> MLP
    (reference chaotic_dwarf.py:128-158): characters normalized over the
    visible-ASCII range, digits parsed as values in a second channel."""

    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bottom_lines: jnp.ndarray) -> jnp.ndarray:  # [B, D] int/float
        B = bottom_lines.shape[0]
        x = bottom_lines.astype(self.dtype)
        chars_norm = (x - 32.0) / 96.0
        digit_mask = jnp.logical_and(x > 44, x < 58).astype(self.dtype)
        digits_norm = digit_mask * (x - 47.0) / 10.0
        h = jnp.stack([chars_norm, digits_norm], axis=-1)  # [B, D, 2] (length, channels)
        for i, (out_ch, k, s) in enumerate([(32, 8, 4), (64, 4, 1)]):
            h = nn.Conv(out_ch, (k,), strides=(s,), padding="VALID", dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.elu(h)
        return _elu_mlp(h.reshape(B, -1), [self.hidden, self.hidden], self.dtype, "blf")


class ScreenEncoder(nn.Module):
    """Conv stack over the tiled tty image [B, H, W, C] (reference
    chaotic_dwarf.py:188-233), scaled to [0, 1]."""

    hidden: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, screen: jnp.ndarray) -> jnp.ndarray:
        B = screen.shape[0]
        x = screen.astype(self.dtype) / 255.0
        for i, (out_ch, k, s) in enumerate([(32, 8, 6), (64, 4, 2), (128, 3, 2), (128, 3, 1)]):
            x = nn.Conv(out_ch, (k, k), strides=(s, s), padding="VALID", dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.elu(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc")(x.reshape(B, -1))
        return nn.elu(x)


class ChaoticDwarvenGPT5(nn.Module):
    """topline ++ bottomlines ++ screen ++ prev-action one-hot."""

    cfg: Any
    obs_space: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        B = obs_dict["tty_chars"].shape[0]
        tty = obs_dict["tty_chars"]
        if self.cfg.use_tty_only:
            topline = tty[:, 0, :]
            bottom = tty[:, -2:, :].reshape(B, -1)
        else:
            topline = obs_dict["message"]
            bottom = obs_dict["blstats"]

        encodings = [
            TopLineEncoder(dtype=self.dtype, name="topline")(topline),
            BottomLinesEncoder(dtype=self.dtype, name="bottomline")(bottom),
            ScreenEncoder(dtype=self.dtype, name="screen")(obs_dict["screen_image"]),
        ]
        if self.cfg.use_prev_action:
            n = int(self.obs_space["prev_actions"].high)
            prev = obs_dict["prev_actions"].astype(jnp.int32).reshape(B)
            encodings.append(jax.nn.one_hot(prev, n, dtype=self.dtype))
        return jnp.concatenate(encodings, axis=-1)


# ------------------------------------------------------------------ ScaledNet


def crop_around_cursor_jax(maps: jnp.ndarray, cursor_rc: jnp.ndarray, crop: int) -> jnp.ndarray:
    """Batched cursor-centered crop: maps [B, H, W, C], cursor_rc [B, 2]
    (row, col) -> [B, crop, crop, C]. Zero-pads at map borders via a padded
    dynamic_slice (replaces the reference's grid_sample-based Crop module)."""
    half = crop // 2
    padded = jnp.pad(maps, ((0, 0), (half, half), (half, half), (0, 0)))

    def one(m, rc):
        # in padded coords the crop window starting at (r, c) is centered on the cursor
        start = (rc[0].astype(jnp.int32), rc[1].astype(jnp.int32), jnp.zeros((), jnp.int32))
        return jax.lax.dynamic_slice(m, start, (crop, crop, m.shape[-1]))

    return jax.vmap(one)(padded, cursor_rc)


class ScaledResBlock(nn.Module):
    channels: int
    kernel: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = x
        for i in range(self.num_layers):
            out = nn.Conv(self.channels, (self.kernel, self.kernel), padding="SAME", dtype=self.dtype, name=f"conv{i}")(out)
            out = nn.GroupNorm(num_groups=min(8, self.channels), dtype=self.dtype, name=f"norm{i}")(out)
            out = nn.elu(out)
        return out + x


class CharColorEncoderResnet(nn.Module):
    """char+color embeddings of the tty map -> IMPALA conv/resnet trunk."""

    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, chars: jnp.ndarray, colors: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        B = chars.shape[0]
        char_emb = nn.Embed(NUM_CHARS, cfg.char_edim, dtype=self.dtype, name="char_embeddings")
        color_emb = nn.Embed(NUM_COLORS, cfg.color_edim, dtype=self.dtype, name="color_embeddings")
        x = jnp.concatenate(
            [char_emb(chars.astype(jnp.int32)), color_emb(colors.astype(jnp.int32))], axis=-1
        )  # [B, H, W, E]
        blocks = [(16, cfg.screen_kernel_size, 2), (32, cfg.screen_kernel_size, 2), (32, cfg.screen_kernel_size, 2)]
        for bi, (out_ch, k, num_res) in enumerate(blocks[: cfg.screen_conv_blocks]):
            x = nn.Conv(out_ch, (k, k), padding="SAME", dtype=self.dtype, name=f"down{bi}")(x)
            if not cfg.no_max_pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
            for ri in range(num_res):
                x = ScaledResBlock(out_ch, k, 2, dtype=self.dtype, name=f"res{bi}_{ri}")(x)
        x = nn.Dense(cfg.fc_after_cnn_hdim, dtype=self.dtype, name="fc")(x.reshape(B, -1))
        return nn.elu(x)


class ScaledNet(nn.Module):
    cfg: Any
    obs_space: Any
    dtype: Any = jnp.float32

    CROP_DIM = 9
    CROP_FILTERS = 8
    CROP_INTER_FILTERS = 16
    CROP_LAYERS = 5

    @nn.compact
    def __call__(self, obs_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        cfg = self.cfg
        tty_chars = obs_dict["tty_chars"]
        tty_colors = obs_dict["tty_colors"]
        B = tty_chars.shape[0]

        topline = tty_chars[:, 0, :]
        bottom = tty_chars[:, -2:, :].reshape(B, -1)
        # the map proper: cut the topline and the two status lines
        map_chars = tty_chars[:, 1:-2, :]
        map_colors = tty_colors[:, 1:-2, :]

        screen_enc = CharColorEncoderResnet(cfg, dtype=self.dtype, name="screen")
        encodings = [
            TopLineEncoder(hidden=cfg.msg_hdim, dtype=self.dtype, name="topline")(topline),
            BottomLinesEncoder(hidden=cfg.blstats_hdim // 4, dtype=self.dtype, name="bottomline")(bottom),
            screen_enc(map_chars, map_colors),
        ]

        if cfg.use_prev_action:
            n = int(self.obs_space["prev_actions"].high)
            prev = obs_dict["prev_actions"].astype(jnp.int32).reshape(B)
            encodings.append(jax.nn.one_hot(prev, n, dtype=self.dtype))

        if cfg.use_crop:
            # cursor (row, col); -1 row offset because the topline was cut
            cursor = obs_dict["tty_cursor"].astype(jnp.int32)
            cursor = jnp.stack([cursor[:, 0] - 1, cursor[:, 1]], axis=-1)
            char_emb = nn.Embed(NUM_CHARS, cfg.char_edim, dtype=self.dtype, name="crop_char_embeddings")
            color_emb = nn.Embed(NUM_COLORS, cfg.color_edim, dtype=self.dtype, name="crop_color_embeddings")
            crop_x = jnp.concatenate(
                [char_emb(map_chars.astype(jnp.int32)), color_emb(map_colors.astype(jnp.int32))], axis=-1
            )
            crop = crop_around_cursor_jax(crop_x, cursor, self.CROP_DIM)
            for i in range(self.CROP_LAYERS):
                out_ch = self.CROP_FILTERS if i == self.CROP_LAYERS - 1 else self.CROP_INTER_FILTERS
                crop = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name=f"crop_conv{i}")(crop)
                if cfg.use_crop_norm:
                    crop = nn.GroupNorm(num_groups=min(8, out_ch), dtype=self.dtype, name=f"crop_norm{i}")(crop)
                crop = nn.elu(crop)
            encodings.append(crop.reshape(B, -1))

        x = jnp.concatenate(encodings, axis=-1)
        for i in range(2):
            x = nn.Dense(cfg.h_dim, dtype=self.dtype, name=f"head_fc{i}")(x)
            x = nn.relu(x)
        return x


MODELS_LOOKUP = {
    "ChaoticDwarvenGPT5": ChaoticDwarvenGPT5,
    "ScaledNet": ScaledNet,
}


def make_nethack_encoder(cfg, obs_space) -> nn.Module:
    from sample_factory_tpu.models.model_utils import default_compute_dtype

    try:
        model_cls = MODELS_LOOKUP[cfg.model]
    except KeyError:
        raise NotImplementedError(f"model={cfg.model}") from None
    return model_cls(cfg, obs_space, dtype=default_compute_dtype(cfg))
