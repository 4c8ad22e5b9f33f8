"""Doom policy encoder in JAX/flax.

Behavioral parity with reference `sf_examples/vizdoom/doom/doom_model.py`
(VizdoomEncoder): the standard image encoder over the pixels plus a 2-layer
128-wide MLP over the `measurements` vector (health/ammo/weapons game
variables added by DoomAdditionalInput), concatenated. NHWC layout; compute
dtype follows --model_dtype like every other encoder in the framework.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from sample_factory_tpu.models.encoder import make_img_encoder
from sample_factory_tpu.models.model_utils import default_compute_dtype, nonlinearity


class VizdoomEncoder(nn.Module):
    cfg: Any
    obs_space: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        act = nonlinearity(self.cfg)
        x = make_img_encoder(self.cfg, self.dtype, name="enc_obs")(obs_dict["obs"])
        if "measurements" in obs_dict:
            m = obs_dict["measurements"].astype(self.dtype)
            for i in range(2):
                m = nn.Dense(128, dtype=self.dtype, name=f"measurements_fc{i}")(m)
                m = act(m)
            x = jnp.concatenate([x, m.astype(x.dtype)], axis=-1)
        return x


def make_vizdoom_encoder(cfg, obs_space) -> nn.Module:
    return VizdoomEncoder(cfg, obs_space, dtype=default_compute_dtype(cfg))
