"""Auto-built encoders over arbitrary dict observation spaces.

Mirrors reference tests/algo/test_model_builder.py (default_make_encoder_func
over 1-D/3-D/multi-key obs spaces) with NHWC image layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sample_factory_tpu.cfg.arguments import parse_sf_args
from sample_factory_tpu.envs.spaces import Box, make_dict_spec
from sample_factory_tpu.models.encoder import default_make_encoder

OBS_SPACES = [
    {"obs_1d": Box((21,))},
    {"obs_1d": Box((21,)), "obs_3d": Box((84, 84, 3))},
    {"obs_1d": Box((21,)), "obs_3d": Box((84, 84, 3)), "obs_3d_2": Box((64, 64, 3))},
    {"obs": Box((21,))},
    {"obs": Box((84, 84, 3))},
    {"obs": Box((84, 84, 3)), "measurements": Box((21,))},
]


@pytest.mark.parametrize("spaces", OBS_SPACES, ids=["1d", "1d+3d", "1d+2x3d", "obs1d", "obs3d", "obs3d+meas"])
def test_default_make_encoder(spaces):
    parser, _ = parse_sf_args(argv=["--env=dummy"])
    cfg = parser.parse_args(["--env=dummy"])
    obs_space = make_dict_spec(spaces)
    encoder = default_make_encoder(cfg, obs_space)

    obs = {k: jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1,) + s.shape), jnp.float32) for k, s in spaces.items()}
    params = encoder.init(jax.random.PRNGKey(0), obs)
    out = encoder.apply(params, obs)

    # each sub-encoder ends in a 512-wide layer by default (reference asserts
    # (1, 512 * num_keys) with its default cfg)
    assert out.shape == (1, 512 * len(spaces))
    assert bool(jnp.isfinite(out).all())


def test_action_mask_key_skips_encoder():
    parser, _ = parse_sf_args(argv=["--env=dummy"])
    cfg = parser.parse_args(["--env=dummy"])
    obs_space = make_dict_spec({"obs": Box((8,)), "action_mask": Box((4,))})
    encoder = default_make_encoder(cfg, obs_space)
    obs = {"obs": jnp.ones((1, 8)), "action_mask": jnp.ones((1, 4))}
    params = encoder.init(jax.random.PRNGKey(0), obs)
    out = encoder.apply(params, obs)
    assert out.shape == (1, 512)  # mask contributed nothing
