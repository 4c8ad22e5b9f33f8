"""Model construction and forward invariants (modeled on reference
tests/algo/test_model.py and test_model_builder.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sample_factory_tpu.cfg.arguments import default_cfg
from sample_factory_tpu.envs.spaces import Box, Discrete, make_dict_spec
from sample_factory_tpu.models.actor_critic import (
    create_actor_critic,
    initial_actor_critic_state,
)


def _make(argv, obs_space=None, action_space=None):
    cfg = default_cfg(env="t", argv=argv + ["--seed=1"])
    obs_space = obs_space or make_dict_spec({"obs": Box((7,))})
    action_space = action_space or Discrete(4)
    model = create_actor_critic(cfg, obs_space, action_space)
    key = jax.random.PRNGKey(0)
    obs = {k: jnp.ones((3,) + s.shape) for k, s in obs_space.items()}
    rnn = initial_actor_critic_state(cfg, 3)
    params = model.init(key, obs, rnn)
    return cfg, model, params, obs, rnn


@pytest.mark.parametrize("share", ["True", "False"])
@pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
def test_recurrent_actor_critic_shapes(share, rnn_type):
    cfg, model, params, obs, rnn = _make(
        ["--use_rnn=True", f"--rnn_type={rnn_type}", "--rnn_size=16", "--rnn_num_layers=2",
         f"--actor_critic_share_weights={share}", "--encoder_mlp_layers", "32"]
    )
    action_params, values, new_state = model.apply(params, obs, rnn)
    assert action_params.shape == (3, 4)
    assert values.shape == (3,)
    assert new_state.shape == rnn.shape
    # state must actually change
    assert not np.allclose(np.asarray(new_state), np.asarray(rnn))


def test_head_core_tail_composition_matches_call():
    cfg, model, params, obs, rnn = _make(["--use_rnn=True", "--rnn_size=8", "--encoder_mlp_layers", "16"])
    ap1, v1, s1 = model.apply(params, obs, rnn)
    head = model.apply(params, obs, method="forward_head")
    core, s2 = model.apply(params, head, rnn, method="forward_core")
    ap2, v2 = model.apply(params, core, method="forward_tail")
    np.testing.assert_allclose(np.asarray(ap1), np.asarray(ap2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("arch", ["convnet_simple", "convnet_atari", "convnet_impala", "resnet_impala"])
def test_conv_encoders(arch):
    obs_space = make_dict_spec({"obs": Box((64, 64, 3))})
    cfg, model, params, obs, rnn = _make(
        ["--use_rnn=False", f"--encoder_conv_architecture={arch}", "--encoder_conv_mlp_layers", "64"],
        obs_space=obs_space,
    )
    action_params, values, _ = model.apply(params, obs, rnn)
    assert action_params.shape == (3, 4)
    assert np.isfinite(np.asarray(values)).all()


def test_multi_input_encoder():
    obs_space = make_dict_spec({"obs": Box((16, 16, 1)), "measurements": Box((5,))})
    cfg, model, params, obs, rnn = _make(["--use_rnn=False"], obs_space=obs_space)
    action_params, values, _ = model.apply(params, obs, rnn)
    assert action_params.shape == (3, 4)


def test_continuous_nonadaptive_stddev():
    action_space = Box((3,), -1, 1)
    cfg, model, params, obs, rnn = _make(
        ["--use_rnn=False", "--adaptive_stddev=False", "--initial_stddev=0.8", "--continuous_tanh_scale=2.0"],
        action_space=action_space,
    )
    action_params, values, _ = model.apply(params, obs, rnn)
    assert action_params.shape == (3, 6)
    # log-std half must equal log(initial_stddev) at init
    np.testing.assert_allclose(np.asarray(action_params[:, 3:]), np.log(0.8), atol=1e-6)
    # means squashed to [-2, 2]
    assert (np.abs(np.asarray(action_params[:, :3])) <= 2.0 + 1e-6).all()


def test_custom_model_factory():
    from flax import linen as nn

    from sample_factory_tpu.algo.context import global_model_factory, reset_global_context

    reset_global_context()

    class TinyEncoder(nn.Module):
        cfg: object
        obs_space: object

        @nn.compact
        def __call__(self, obs_dict):
            return nn.Dense(12)(obs_dict["obs"])

    global_model_factory().register_encoder_factory(lambda cfg, obs_space: TinyEncoder(cfg, obs_space))
    try:
        cfg, model, params, obs, rnn = _make(["--use_rnn=False"])
        head = model.apply(params, obs, method="forward_head")
        assert head.shape == (3, 12)
    finally:
        reset_global_context()
