"""Direct ONNX export parity (reference export_onnx.py:26-100 + its
round-trip test, tests/examples/test_example.py:83-92).

onnxruntime is not installable here (zero egress; logged in
docs/evidence/install_attempts), so the exported graph is executed by the
independent numpy interpreter (sample_factory_tpu/onnx/interp.py) and
compared against the jax deterministic inference fn — same contract the
reference verifies through onnxruntime."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sample_factory_tpu.algo.learning import init_train_state
from sample_factory_tpu.algo.optimizers import make_optimizer
from sample_factory_tpu.cfg.arguments import default_cfg
from sample_factory_tpu.envs.builtin.synthetic import (
    SyntheticContinuousEnv,
    SyntheticDiscreteEnv,
    SyntheticMaskedEnv,
    SyntheticVectorDiscreteEnv,
)
from sample_factory_tpu.envs.env_info import extract_env_info
from sample_factory_tpu.envs.spaces import obs_space_as_dict
from sample_factory_tpu.export_model import build_inference_fn
from sample_factory_tpu.export_onnx import build_policy_onnx
from sample_factory_tpu.models.actor_critic import create_actor_critic, initial_actor_critic_state
from sample_factory_tpu.onnx.interp import run_model


def _setup(env, argv, batch=3, seed=0):
    cfg = default_cfg(env="t", argv=argv + [f"--seed={seed}"])
    env_info = extract_env_info(env, cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(seed)
    obs_spec = obs_space_as_dict(env_info.obs_space)
    rng = np.random.default_rng(seed)
    obs_np = {k: rng.normal(0.3, 1.1, size=(batch,) + tuple(s.shape)).astype(np.float32) for k, s in obs_spec.items()}
    if "action_mask" in obs_np:
        obs_np["action_mask"] = (rng.random(obs_np["action_mask"].shape) > 0.4).astype(np.float32)
        obs_np["action_mask"][:, 0] = 1.0  # at least one legal action
    example_obs = {k: jnp.asarray(v) for k, v in obs_np.items()}
    ts = init_train_state(cfg, env_info, model, tx, key, example_obs)
    rnn = rng.normal(0.1, 0.5, size=(batch, initial_actor_critic_state(cfg, batch).shape[-1])).astype(np.float32)
    return cfg, env_info, model, ts, obs_np, rnn


def _compare(cfg, env_info, model, ts, obs_np, rnn, atol=2e-4):
    infer = build_inference_fn(cfg, env_info, model, ts, deterministic=True)
    jax_actions, jax_rnn = jax.jit(infer)(
        {k: jnp.asarray(v) for k, v in obs_np.items()}, jnp.asarray(rnn), jax.random.PRNGKey(0)
    )

    blob = build_policy_onnx(cfg, env_info, ts, batch_size=obs_np[next(iter(obs_np))].shape[0])
    feeds = dict(obs_np)
    feeds["rnn_state"] = rnn
    outs = run_model(blob, feeds)
    names = list(outs.keys())
    onnx_actions, onnx_rnn = outs[names[0]], outs[names[1]]

    ja = np.asarray(jax_actions)
    if ja.dtype in (np.int32, np.int64):
        np.testing.assert_array_equal(onnx_actions.reshape(ja.shape).astype(ja.dtype), ja)
    else:
        np.testing.assert_allclose(onnx_actions.reshape(ja.shape), ja, atol=atol)
    np.testing.assert_allclose(onnx_rnn, np.asarray(jax_rnn), atol=atol)
    return blob


def test_onnx_mlp_continuous_nonadaptive_tanh():
    env = SyntheticContinuousEnv(dim=3)
    cfg, env_info, model, ts, obs, rnn = _setup(
        env,
        ["--use_rnn=False", "--encoder_mlp_layers", "32", "16", "--adaptive_stddev=False",
         "--continuous_tanh_scale=2.0", "--normalize_input=True"],
    )
    _compare(cfg, env_info, model, ts, obs, rnn)


def test_onnx_mlp_continuous_adaptive():
    env = SyntheticContinuousEnv(dim=2)
    cfg, env_info, model, ts, obs, rnn = _setup(
        env, ["--use_rnn=False", "--encoder_mlp_layers", "24", "--normalize_input=False"]
    )
    _compare(cfg, env_info, model, ts, obs, rnn)


def test_onnx_conv_gru_discrete():
    """The pixel flagship shape: IMPALA conv stack + GRU core + argmax."""
    env = SyntheticDiscreteEnv(num_actions=6, res=24)
    cfg, env_info, model, ts, obs, rnn = _setup(
        env,
        ["--use_rnn=True", "--rnn_type=gru", "--rnn_size=64",
         "--encoder_conv_architecture=convnet_impala", "--encoder_conv_mlp_layers", "48",
         "--normalize_input=True", "--obs_subtract_mean=0.5", "--obs_scale=1.5"],
    )
    _compare(cfg, env_info, model, ts, obs, rnn)


def test_onnx_lstm_multilayer_decoder():
    env = SyntheticVectorDiscreteEnv(num_actions=5, dim=12)
    cfg, env_info, model, ts, obs, rnn = _setup(
        env,
        ["--use_rnn=True", "--rnn_type=lstm", "--rnn_num_layers=2", "--rnn_size=32",
         "--encoder_mlp_layers", "24", "--decoder_mlp_layers", "16", "--normalize_input=True"],
    )
    _compare(cfg, env_info, model, ts, obs, rnn)


def test_onnx_separate_weights_gru():
    env = SyntheticVectorDiscreteEnv(num_actions=4, dim=8)
    cfg, env_info, model, ts, obs, rnn = _setup(
        env,
        ["--use_rnn=True", "--rnn_type=gru", "--rnn_size=24",
         "--actor_critic_share_weights=False", "--encoder_mlp_layers", "16",
         "--normalize_input=True"],
    )
    _compare(cfg, env_info, model, ts, obs, rnn)


def test_onnx_action_mask():
    env = SyntheticMaskedEnv(num_actions=6, dim=8)
    cfg, env_info, model, ts, obs, rnn = _setup(
        env, ["--use_rnn=False", "--encoder_mlp_layers", "16", "--normalize_input=False"]
    )
    blob = _compare(cfg, env_info, model, ts, obs, rnn)
    # masked actions must never be selected
    feeds = dict(obs)
    feeds["rnn_state"] = rnn
    outs = run_model(blob, feeds)
    acts = list(outs.values())[0].reshape(-1)
    for i, a in enumerate(acts):
        assert obs["action_mask"][i, int(a)] == 1.0


def test_onnx_file_roundtrip(tmp_path):
    """The serialized artifact parses back into a structurally valid model."""
    from sample_factory_tpu.onnx import onnx_pb2 as ox

    env = SyntheticVectorDiscreteEnv(num_actions=3, dim=4)
    cfg, env_info, model, ts, obs, rnn = _setup(env, ["--use_rnn=False", "--encoder_mlp_layers", "8"])
    blob = build_policy_onnx(cfg, env_info, ts, batch_size=3)
    p = tmp_path / "policy.onnx"
    p.write_bytes(blob)
    m = ox.ModelProto()
    m.ParseFromString(p.read_bytes())
    assert m.ir_version == 8
    assert m.opset_import[0].version == 17
    assert len(m.graph.node) > 0 and len(m.graph.initializer) > 0
    assert {vi.name for vi in m.graph.input} >= {"obs", "rnn_state"}
    assert len(m.graph.output) == 2


def test_onnx_tuple_actions():
    """Mixed tuple (Discrete + Box): per-subspace argmax/means, concat float32."""
    from sample_factory_tpu.envs.builtin.synthetic import SyntheticTupleActionEnv

    env = SyntheticTupleActionEnv()
    cfg, env_info, model, ts, obs, rnn = _setup(
        env, ["--use_rnn=False", "--encoder_mlp_layers", "16", "--normalize_input=True"]
    )
    _compare(cfg, env_info, model, ts, obs, rnn)
