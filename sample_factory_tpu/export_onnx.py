"""Direct ONNX export of a trained policy — no torch/tf/tf2onnx required.

Parity: reference `sample_factory/export_onnx.py:26-100` (OnnxExporter wraps
the actor-critic; deterministic actions via argmax; RNN state as an explicit
input/output). The reference delegates graph capture to torch.onnx; JAX has
no ONNX exporter and this box cannot install one (zero egress,
docs/evidence/install_attempts), so this module builds the ONNX graph
DIRECTLY from the flax param tree: every module family the default model
factory produces (MLP/conv encoders, multi-input concat, GRU/LSTM cores,
MLP decoder, both action parameterizations, obs normalization) has a
hand-mapped ONNX subgraph. Exported graphs are validated against the jax
forward pass by `sample_factory_tpu/onnx/interp.py` (tests/test_export_onnx.py).

Semantics of the exported function (matches export_model.build_inference_fn
with deterministic=True):

    (obs..., [action_mask], rnn_state) -> (actions, new_rnn_state)

Limitations (documented, raise NotImplementedError): resnet encoders,
custom user models, action masks on tuple spaces, stochastic (sampling)
policies.
"""

from __future__ import annotations

from os.path import join
from typing import Any, Dict, Optional

import jax
import numpy as np

from sample_factory_tpu.envs.spaces import is_continuous_action_space, obs_space_as_dict
from sample_factory_tpu.models.encoder import CONV_FILTERS
from sample_factory_tpu.onnx.builder import FLOAT, INT32, OnnxGraphBuilder
from sample_factory_tpu.utils.utils import experiment_dir, log


def _np_tree(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def _build_preprocess(b: OnnxGraphBuilder, cfg, key: str, x: str) -> str:
    """_static_preprocess (algo/sampling.py:305): sub/scale on the "obs" key."""
    if key == "obs":
        if cfg.obs_subtract_mean != 0.0:
            x = b.node("Sub", [x, b.const(np.float32(cfg.obs_subtract_mean), "sub_mean")])
        if cfg.obs_scale != 1.0:
            x = b.node("Div", [x, b.const(np.float32(cfg.obs_scale), "scale")])
    return x


def _build_normalize(b: OnnxGraphBuilder, rms_state, x: str) -> str:
    """rms_normalize: clip((x - mean) / sqrt(var + eps), +-clip)."""
    mean = np.asarray(rms_state.running_mean, np.float32)
    sigma = np.sqrt(np.asarray(rms_state.running_var, np.float32) + rms_state.eps)
    if rms_state.norm_only:
        return b.node("Div", [x, b.const(sigma, "rms_sigma")])
    y = b.node("Sub", [x, b.const(mean, "rms_mean")])
    y = b.node("Div", [y, b.const(sigma, "rms_sigma")])
    return b.clip(y, -float(rms_state.clip), float(rms_state.clip))


def _dense_stack(b: OnnxGraphBuilder, cfg, params: Dict[str, Any], x: str) -> str:
    """Sequential Dense_i + nonlinearity (Mlp encoder/decoder, conv MLP tail)."""
    i = 0
    while f"Dense_{i}" in params:
        d = params[f"Dense_{i}"]
        x = b.gemm(x, d["kernel"], d.get("bias"))
        x = b.activation(x, cfg.nonlinearity)
        i += 1
    return x


def _build_conv_encoder(b: OnnxGraphBuilder, cfg, params: Dict[str, Any], x: str, obs_shape) -> str:
    """ConvEncoder (models/encoder.py:41): NHWC conv stack, VALID padding,
    flatten in NHWC order, then the conv MLP. ONNX Conv is NCHW, so the
    subgraph transposes in, convolves, transposes back, and flattens —
    bit-identical feature ordering to the flax model."""
    arch = cfg.encoder_conv_architecture
    if arch not in CONV_FILTERS:
        raise NotImplementedError(f"ONNX export: unsupported conv architecture {arch} (resnet not mapped)")
    filters = CONV_FILTERS[arch]
    x = b.node("Transpose", [x], perm=[0, 3, 1, 2])  # NHWC -> NCHW
    for i, (_out_ch, kernel, stride) in enumerate(filters):
        cp = params[f"Conv_{i}"]
        w = np.asarray(cp["kernel"], np.float32).transpose(3, 2, 0, 1)  # HWIO -> OIHW
        ins = [x, b.init(w, f"conv_w{i}")]
        if "bias" in cp:
            ins.append(b.init(np.asarray(cp["bias"], np.float32), f"conv_b{i}"))
        x = b.node("Conv", ins, strides=[stride, stride], pads=[0, 0, 0, 0], kernel_shape=[kernel, kernel])
        x = b.activation(x, cfg.nonlinearity)
    x = b.node("Transpose", [x], perm=[0, 2, 3, 1])  # back to NHWC
    x = b.reshape(x, [0, -1])  # [B, H*W*C], 0 = copy batch dim
    return _dense_stack(b, cfg, params, x)


def _build_encoder(b: OnnxGraphBuilder, cfg, enc_params: Dict[str, Any], obs_spec, normalized: Dict[str, str]) -> str:
    """MultiInputEncoder (models/encoder.py:119): per-key encoder, sorted keys,
    concat."""
    encodings = []
    for key in sorted(obs_spec.keys()):
        if key == "action_mask":
            continue
        sub = enc_params[f"enc_{key}"]
        shape = obs_spec[key].shape
        if len(shape) == 1:
            encodings.append(_dense_stack(b, cfg, sub, normalized[key]))
        else:
            encodings.append(_build_conv_encoder(b, cfg, sub, normalized[key], shape))
    if len(encodings) == 1:
        return encodings[0]
    return b.node("Concat", encodings, axis=1)


def _gru_step(b: OnnxGraphBuilder, cell: Dict[str, Any], x: str, h: str) -> str:
    """FusedGRUCell single step (ops/rnn_cells.py:61-65), gate layout [r,z,n]."""
    x_proj = b.gemm(x, cell["wi"], cell["bi"])
    h_proj = b.gemm(h, cell["wh"], cell["bh"])
    xr, xz, xn = b.node("Split", [x_proj], n_out=3, axis=1)
    hr, hz, hn = b.node("Split", [h_proj], n_out=3, axis=1)
    r = b.node("Sigmoid", [b.node("Add", [xr, hr])])
    z = b.node("Sigmoid", [b.node("Add", [xz, hz])])
    n = b.node("Tanh", [b.node("Add", [xn, b.node("Mul", [r, hn])])])
    one = b.const(np.float32(1.0), "one")
    return b.node("Add", [b.node("Mul", [b.node("Sub", [one, z]), n]), b.node("Mul", [z, h])])


def _lstm_step(b: OnnxGraphBuilder, cell: Dict[str, Any], x: str, h: str, c: str):
    """FusedLSTMCell single step: gate layout [i,f,g,o], forget bias 1.0."""
    proj = b.node("Add", [b.gemm(x, cell["wi"], cell["bi"]), b.node("MatMul", [h, b.init(np.asarray(cell["wh"], np.float32), "wh")])])
    i, f, g, o = b.node("Split", [proj], n_out=4, axis=1)
    one = b.const(np.float32(1.0), "one")
    new_c = b.node(
        "Add",
        [
            b.node("Mul", [b.node("Sigmoid", [b.node("Add", [f, one])]), c]),
            b.node("Mul", [b.node("Sigmoid", [i]), b.node("Tanh", [g])]),
        ],
    )
    new_h = b.node("Mul", [b.node("Sigmoid", [o]), b.node("Tanh", [new_c])])
    return new_h, new_c


def _build_core(b: OnnxGraphBuilder, cfg, core_params: Optional[Dict[str, Any]], x: str, rnn_in: Optional[str], rnn_offset: int):
    """ModelCoreRNN (models/core.py): layered GRU/LSTM over the flat state
    chunk starting at rnn_offset (separate-weights towers use halves)."""
    if not cfg.use_rnn:
        return x, []
    size = cfg.rnn_size
    is_lstm = cfg.rnn_type == "lstm"
    per_layer = size * (2 if is_lstm else 1)
    new_chunks = []
    inp = x
    for layer in range(cfg.rnn_num_layers):
        lo = rnn_offset + layer * per_layer
        cell = core_params[("lstm_" if is_lstm else "gru_") + str(layer)]
        if is_lstm:
            h = b.slice(rnn_in, [lo], [lo + size], [1])
            c = b.slice(rnn_in, [lo + size], [lo + 2 * size], [1])
            new_h, new_c = _lstm_step(b, cell, inp, h, c)
            new_chunks.append(b.node("Concat", [new_h, new_c], axis=1))
            inp = new_h
        else:
            h = b.slice(rnn_in, [lo], [lo + per_layer], [1])
            new_h = _gru_step(b, cell, inp, h)
            new_chunks.append(new_h)
            inp = new_h
    return inp, new_chunks


def _build_action_head(b: OnnxGraphBuilder, cfg, env_info, ap_params: Dict[str, Any], decoded: str, mask: Optional[str]):
    space = env_info.action_space
    if is_continuous_action_space(space):
        d = ap_params["Dense_0"]
        n = int(np.asarray(d["kernel"]).shape[1])
        means = b.gemm(decoded, d["kernel"], d.get("bias"))
        if not cfg.adaptive_stddev:
            ts = cfg.continuous_tanh_scale
            if ts > 0:
                means = b.node("Mul", [b.node("Tanh", [b.node("Div", [means, b.const(np.float32(ts))])]), b.const(np.float32(ts))])
            width = n
        else:
            # default head outputs [means, log_std]: deterministic action = means
            means = b.slice(means, [0], [n // 2], [1])
            width = n // 2
        return means, "float", width
    from sample_factory_tpu.envs.spaces import Discrete, TupleSpec, num_action_parameters, num_actions
    from sample_factory_tpu.onnx import onnx_pb2 as ox

    if isinstance(space, TupleSpec):
        # TupleDistribution.argmax (algo/distributions.py:175): per-subspace
        # argmax/means, concatenated; mixed tuples emit float32, all-discrete
        # int32 (envs/spaces.py action_dtype)
        if mask is not None:
            raise NotImplementedError("ONNX export: action masks on tuple spaces not mapped")
        d = ap_params["Dense_0"]
        logits = b.gemm(decoded, d["kernel"], d.get("bias"))
        mixed = any(not isinstance(s_i, Discrete) for s_i in space.spaces)
        out_elem = ox.TensorProto.FLOAT if mixed else ox.TensorProto.INT32
        parts, offset = [], 0
        for s_i in space.spaces:
            w_i = num_action_parameters(s_i)
            chunk = b.slice(logits, [offset], [offset + w_i], [1])
            offset += w_i
            if isinstance(s_i, Discrete):
                am = b.node("ArgMax", [chunk], axis=-1, keepdims=1)
                parts.append(b.node("Cast", [am], to=int(out_elem)))
            else:
                means = b.slice(chunk, [0], [w_i // 2], [1])  # adaptive layout [means, log_std]
                parts.append(b.node("Cast", [means], to=int(out_elem)) if out_elem != ox.TensorProto.FLOAT else means)
        actions = b.node("Concat", parts, axis=1)
        width = sum(num_actions(s_i) for s_i in space.spaces)
        return actions, ("float" if mixed else "int"), width
    d = ap_params["Dense_0"]
    logits = b.gemm(decoded, d["kernel"], d.get("bias"))
    if mask is not None:
        # argmax of masked probs == argmax of (logits - (1-mask)*1e9)
        one = b.const(np.float32(1.0))
        penalty = b.node("Mul", [b.node("Sub", [one, mask]), b.const(np.float32(1e9))])
        logits = b.node("Sub", [logits, penalty])
    am = b.node("ArgMax", [logits], axis=-1, keepdims=1)
    return b.node("Cast", [am], to=int(ox.TensorProto.INT32)), "int", 1


def build_policy_onnx(cfg, env_info, ts, batch_size: int = 1) -> bytes:
    """Assemble the deterministic-policy ONNX graph from a train state."""
    params = _np_tree(ts.params)["params"]
    obs_rms = _np_tree(ts.obs_rms) if ts.obs_rms is not None else None
    obs_spec = obs_space_as_dict(env_info.obs_space)
    shared = cfg.actor_critic_share_weights

    b = OnnxGraphBuilder("sample_factory_tpu_policy")
    raw: Dict[str, str] = {}
    for key in sorted(obs_spec.keys()):
        raw[key] = b.add_input(key, (batch_size,) + tuple(obs_spec[key].shape), FLOAT)
    mask = raw.get("action_mask")

    from sample_factory_tpu.models.actor_critic import actor_critic_rnn_state_size

    S = actor_critic_rnn_state_size(cfg)
    rnn_in = b.add_input("rnn_state", (batch_size, S), FLOAT)

    normalized: Dict[str, str] = {}
    for key in sorted(obs_spec.keys()):
        if key == "action_mask":
            continue
        x = _build_preprocess(b, cfg, key, raw[key])
        if obs_rms is not None and ts.obs_rms is not None and key in ts.obs_rms:
            x = _build_normalize(b, ts.obs_rms[key], x)
        normalized[key] = x

    if shared:
        head = _build_encoder(b, cfg, params["encoder"], obs_spec, normalized)
        core_out, actor_chunks = _build_core(b, cfg, params.get("core"), head, rnn_in, 0)
        decoded = _dense_stack(b, cfg, params.get("decoder", {}), core_out)
        actions, kind, width = _build_action_head(b, cfg, env_info, params["action_parameterization"], decoded, mask)
        new_chunks = actor_chunks
    else:
        half = S // 2
        actor_head = _build_encoder(b, cfg, params["actor_encoder"], obs_spec, normalized)
        critic_head = _build_encoder(b, cfg, params["critic_encoder"], obs_spec, normalized)
        actor_out, actor_chunks = _build_core(b, cfg, params.get("actor_core"), actor_head, rnn_in, 0)
        _critic_out, critic_chunks = _build_core(b, cfg, params.get("critic_core"), critic_head, rnn_in, half)
        decoded = _dense_stack(b, cfg, params.get("actor_decoder", {}), actor_out)
        actions, kind, width = _build_action_head(b, cfg, env_info, params["action_parameterization"], decoded, mask)
        new_chunks = actor_chunks + critic_chunks

    if cfg.use_rnn:
        new_rnn = b.node("Concat", new_chunks, axis=1) if len(new_chunks) > 1 else new_chunks[0]
    else:
        new_rnn = b.node("Identity", [rnn_in])
    # declare graph outputs with the real tensor names
    b.add_output(actions, (batch_size, width), INT32 if kind == "int" else FLOAT)
    b.add_output(new_rnn, (batch_size, S), FLOAT)

    return b.model_bytes(
        doc=f"sample_factory_tpu deterministic policy (env={cfg.env}); "
        f"(obs..., rnn_state) -> (actions, new_rnn_state); "
        f"reference parity: sample_factory/export_onnx.py:26-100"
    )


def export_policy_onnx(cfg, batch_size: int = 1, output_path: Optional[str] = None) -> str:
    """Load the checkpoint and write <experiment>/policy_p<i>.onnx."""
    from sample_factory_tpu.algo.learning import init_train_state
    from sample_factory_tpu.algo.optimizers import make_optimizer
    from sample_factory_tpu.cfg.arguments import load_from_checkpoint
    from sample_factory_tpu.envs.env_info import obtain_env_info
    from sample_factory_tpu.models.actor_critic import create_actor_critic, initial_actor_critic_state
    from sample_factory_tpu.runner.checkpoint import load_checkpoint
    from sample_factory_tpu.utils.utils import configure_jax_platform

    configure_jax_platform(cfg)
    cfg = load_from_checkpoint(cfg)
    env_info = obtain_env_info(cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)

    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    obs_spec = obs_space_as_dict(env_info.obs_space)
    example_obs = {k: jnp.zeros((batch_size,) + tuple(s.shape), jnp.float32) for k, s in obs_spec.items()}
    ts = init_train_state(cfg, env_info, model, tx, key, example_obs)
    restored = load_checkpoint(cfg, cfg.policy_index, ts)
    if restored is None:
        raise FileNotFoundError("no checkpoint to export")
    ts = restored[0]

    blob = build_policy_onnx(cfg, env_info, ts, batch_size)
    output_path = output_path or join(experiment_dir(cfg), f"policy_p{cfg.policy_index}.onnx")
    with open(output_path, "wb") as f:
        f.write(blob)
    log.info("Exported ONNX policy (%d bytes) to %s", len(blob), output_path)
    return output_path


def main() -> int:
    import argparse

    from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--export_batch_size", type=int, default=1)
    extra.add_argument("--export_output", type=str, default=None)
    known, rest = extra.parse_known_args()

    parser, _ = parse_sf_args(argv=rest, evaluation=True)
    cfg = parse_full_cfg(parser, argv=rest)
    from sample_factory_tpu.algo.context import global_env_registry

    if cfg.env not in global_env_registry():
        # plain gymnasium id convenience, same as the enjoy CLI
        from sf_examples_tpu.train_gym_env import register_gym_env

        register_gym_env(cfg.env)
    export_policy_onnx(cfg, known.export_batch_size, known.export_output)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
