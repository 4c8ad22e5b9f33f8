"""Observation encoders: MLP, conv stacks, IMPALA resnet, multi-input.

Parity: reference `sample_factory/model/encoder.py` — MultiInputEncoder (:33),
MlpEncoder (:72), ConvEncoder with convnet_simple/impala/atari filter stacks
(:122-151), ResnetEncoder (resnet_impala, :173-231). TPU-native differences:
NHWC layout (XLA's native conv layout; the reference uses NCHW for torch),
optional bfloat16 compute, and XLA fusion instead of torch.jit.script.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sample_factory_tpu.models.model_utils import bias_initializer, kernel_initializer, nonlinearity

# conv filter stacks: (out_channels, kernel, stride), VALID padding
CONV_FILTERS = {
    "convnet_simple": [(32, 8, 4), (64, 4, 2), (128, 3, 2)],
    "convnet_impala": [(16, 8, 4), (32, 4, 2)],
    "convnet_atari": [(32, 8, 4), (64, 4, 2), (64, 3, 1)],
}


class MlpEncoder(nn.Module):
    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs):
        act = nonlinearity(self.cfg)
        x = obs.astype(self.dtype)
        for size in self.cfg.encoder_mlp_layers:
            x = nn.Dense(size, kernel_init=kernel_initializer(self.cfg), bias_init=bias_initializer(self.cfg), dtype=self.dtype)(x)
            x = act(x)
        return x


class ConvEncoder(nn.Module):
    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs):
        """obs: [..., H, W, C] float (already normalized)."""
        act = nonlinearity(self.cfg)
        x = obs.astype(self.dtype)
        batch_dims = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        for out_ch, kernel, stride in CONV_FILTERS[self.cfg.encoder_conv_architecture]:
            x = nn.Conv(
                out_ch,
                (kernel, kernel),
                strides=(stride, stride),
                padding="VALID",
                kernel_init=kernel_initializer(self.cfg),
                bias_init=bias_initializer(self.cfg),
                dtype=self.dtype,
            )(x)
            x = act(x)
        x = x.reshape(batch_dims + (-1,))
        for size in self.cfg.encoder_conv_mlp_layers:
            x = nn.Dense(size, kernel_init=kernel_initializer(self.cfg), bias_init=bias_initializer(self.cfg), dtype=self.dtype)(x)
            x = act(x)
        return x


class ResBlock(nn.Module):
    cfg: Any
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = nonlinearity(self.cfg)
        out = act(x)
        out = nn.Conv(self.channels, (3, 3), padding="SAME", kernel_init=kernel_initializer(self.cfg), dtype=self.dtype)(out)
        out = act(out)
        out = nn.Conv(self.channels, (3, 3), padding="SAME", kernel_init=kernel_initializer(self.cfg), dtype=self.dtype)(out)
        return out + x


class ResnetEncoder(nn.Module):
    """IMPALA resnet: [[16,2],[32,2],[32,2]] (reference :173-231)."""

    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs):
        act = nonlinearity(self.cfg)
        x = obs.astype(self.dtype)
        batch_dims = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        resnet_conf = [(16, 2), (32, 2), (32, 2)]
        for out_ch, res_blocks in resnet_conf:
            x = nn.Conv(out_ch, (3, 3), padding="SAME", kernel_init=kernel_initializer(self.cfg), dtype=self.dtype)(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            for _ in range(res_blocks):
                x = ResBlock(self.cfg, out_ch, dtype=self.dtype)(x)
        x = act(x)
        x = x.reshape(batch_dims + (-1,))
        for size in self.cfg.encoder_conv_mlp_layers:
            x = nn.Dense(size, kernel_init=kernel_initializer(self.cfg), bias_init=bias_initializer(self.cfg), dtype=self.dtype)(x)
            x = act(x)
        return x


def make_img_encoder(cfg, dtype, name=None):
    if cfg.encoder_conv_architecture.startswith("convnet"):
        return ConvEncoder(cfg, dtype=dtype, name=name)
    if cfg.encoder_conv_architecture.startswith("resnet"):
        return ResnetEncoder(cfg, dtype=dtype, name=name)
    raise NotImplementedError(f"Unknown conv architecture {cfg.encoder_conv_architecture}")


class MultiInputEncoder(nn.Module):
    """Encode each obs key (sorted order) and concatenate (reference :33-70).

    1-D subspaces get the MLP encoder, >=2-D get a conv/resnet encoder.
    """

    cfg: Any
    obs_space: Any  # DictSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs_dict: Dict[str, jnp.ndarray]):
        encodings = []
        for key in sorted(self.obs_space.keys()):
            if key == "action_mask":
                # convention: the action mask rides in the obs dict but feeds
                # the action distribution, not the encoder
                continue
            shape = self.obs_space[key].shape
            if len(shape) == 1:
                enc = MlpEncoder(self.cfg, dtype=self.dtype, name=f"enc_{key}")
            else:
                enc = make_img_encoder(self.cfg, self.dtype, name=f"enc_{key}")
            encodings.append(enc(obs_dict[key]))
        if len(encodings) == 1:
            return encodings[0]
        return jnp.concatenate(encodings, axis=-1)


def default_make_encoder(cfg, obs_space, dtype=jnp.float32) -> nn.Module:
    """Reference default_make_encoder_func (:234-242)."""
    return MultiInputEncoder(cfg, obs_space, dtype=dtype)
