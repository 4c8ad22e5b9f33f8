"""Model export for deployment: StableHLO (jax.export) + TF SavedModel.

The TPU-native serialization format is jax.export (StableHLO, loadable from
any XLA runtime). For ONNX, use `sample_factory_tpu/export_onnx.py` — the
direct flax->ONNX builder (reference parity: `sample_factory/export_onnx.py`).
`export_tf_saved_model` remains for models the direct builder doesn't map
(resnet encoders, tuple action heads, custom user models); on jax versions
with graph serialization its SavedModel is tf2onnx-convertible
(docs/migration.md).
"""

from __future__ import annotations

import os
from os.path import join
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sample_factory_tpu.algo.distributions import argmax_actions, get_action_distribution
from sample_factory_tpu.algo.learning import init_train_state
from sample_factory_tpu.algo.optimizers import make_optimizer
from sample_factory_tpu.algo.running_mean_std import obs_rms_normalize
from sample_factory_tpu.algo.sampling import _static_preprocess
from sample_factory_tpu.cfg.arguments import load_from_checkpoint
from sample_factory_tpu.envs.env_info import obtain_env_info
from sample_factory_tpu.envs.spaces import action_dtype, obs_space_as_dict
from sample_factory_tpu.models.actor_critic import create_actor_critic, initial_actor_critic_state
from sample_factory_tpu.runner.checkpoint import load_checkpoint
from sample_factory_tpu.utils.utils import experiment_dir, log


def build_inference_fn(cfg, env_info, model, ts, deterministic: bool = True):
    """A self-contained (obs, rnn_state, key) -> (actions, new_rnn_state) fn
    with normalization folded in — the exported policy."""
    a_dtype = jnp.int32 if action_dtype(env_info.action_space) == "int32" else jnp.float32
    params, obs_rms = ts.params, ts.obs_rms

    def infer(obs, rnn_state, key):
        normalized = obs_rms_normalize(obs_rms, _static_preprocess(cfg, obs)) if obs_rms is not None else _static_preprocess(cfg, obs)
        action_params, values, new_rnn = model.apply(params, normalized, rnn_state)
        # action_mask rides in the raw obs dict (same contract as the sampler's
        # policy_step) — caught by the ONNX parity test: dropping it here made
        # exported/eval policies pick masked actions
        dist = get_action_distribution(env_info.action_space, action_params, obs.get("action_mask"))
        if deterministic:
            actions = argmax_actions(dist)
        else:
            actions = dist.sample(key)
        return actions.astype(a_dtype), new_rnn

    return infer


def export_model(cfg, batch_size: int = 1, output_path: Optional[str] = None) -> str:
    """Serialize the policy to a StableHLO artifact via jax.export."""
    from sample_factory_tpu.utils.utils import configure_jax_platform

    configure_jax_platform(cfg)
    cfg = load_from_checkpoint(cfg)
    env_info = obtain_env_info(cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)

    key = jax.random.PRNGKey(0)
    obs_spec = obs_space_as_dict(env_info.obs_space)
    example_obs = {k: jnp.zeros((batch_size,) + tuple(s.shape), jnp.float32) for k, s in obs_spec.items()}
    rnn_state = initial_actor_critic_state(cfg, batch_size)

    ts = init_train_state(cfg, env_info, model, tx, key, example_obs)
    restored = load_checkpoint(cfg, cfg.policy_index, ts)
    if restored is None:
        raise FileNotFoundError("no checkpoint to export")
    ts = restored[0]

    infer = build_inference_fn(cfg, env_info, model, ts, deterministic=cfg.eval_deterministic)

    from jax import export as jax_export

    exported = jax_export.export(jax.jit(infer))(example_obs, rnn_state, key)
    blob = exported.serialize()

    output_path = output_path or join(experiment_dir(cfg), f"policy_p{cfg.policy_index}.stablehlo")
    with open(output_path, "wb") as f:
        f.write(blob)
    log.info("Exported policy (%d bytes StableHLO) to %s", len(blob), output_path)
    return output_path


def load_exported_model(path: str):
    """Deserialize and return a callable (obs, rnn_state, key) -> (actions, rnn)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call


def export_tf_saved_model(cfg, batch_size: int = 1, output_path: Optional[str] = None) -> str:
    """Serialize the policy to a TensorFlow SavedModel via jax2tf — the ONNX
    interop path (reference `sample_factory/export_onnx.py:26-100`).

    ONNX has no first-class JAX serialization, so the supported recipe is the
    two-step one every JAX project uses:

        1. python -m sample_factory_tpu.export_model --env=... \
               --experiment=... --export_format=saved_model
        2. python -m tf2onnx.convert \
               --saved-model <experiment>/policy_p0_saved_model \
               --output policy.onnx             (tf2onnx, run where installed)

    The conversion prefers jax2tf graph serialization (pure TF ops, which
    tf2onnx can digest); if this jax version only supports native
    serialization (StableHLO inside a XlaCallModule op) we fall back to it
    with a warning — that SavedModel still runs under TF but tf2onnx cannot
    convert it, and the StableHLO artifact from export_model() is the better
    interchange format.

    Exports the DETERMINISTIC (argmax) policy: (obs dict, rnn_state) ->
    (actions, new_rnn_state); normalization is folded in.
    """
    import tensorflow as tf  # gated: baked into this image; guarded import for others

    from jax.experimental import jax2tf

    from sample_factory_tpu.utils.utils import configure_jax_platform

    configure_jax_platform(cfg)
    cfg = load_from_checkpoint(cfg)
    env_info = obtain_env_info(cfg)
    model = create_actor_critic(cfg, env_info.obs_space, env_info.action_space)
    tx = make_optimizer(cfg)

    key = jax.random.PRNGKey(0)
    obs_spec = obs_space_as_dict(env_info.obs_space)
    example_obs = {k: jnp.zeros((batch_size,) + tuple(s.shape), jnp.float32) for k, s in obs_spec.items()}
    rnn_state = initial_actor_critic_state(cfg, batch_size)

    ts = init_train_state(cfg, env_info, model, tx, key, example_obs)
    restored = load_checkpoint(cfg, cfg.policy_index, ts)
    if restored is None:
        raise FileNotFoundError("no checkpoint to export")
    ts = restored[0]

    infer = build_inference_fn(cfg, env_info, model, ts, deterministic=True)

    def infer_det(obs, rnn):
        return infer(obs, rnn, jax.random.PRNGKey(0))

    # On recent jax versions `native_serialization=False` is silently ignored
    # (DeprecationWarning only), so requesting graph serialization proves
    # nothing.  Detect the serialization mode that was ACTUALLY used by
    # inspecting the traced graph: native serialization shows up as an
    # XlaCallModule op wrapping the StableHLO payload.
    tf_fn = jax2tf.convert(infer_det, with_gradient=False, native_serialization=False)

    module = tf.Module()
    obs_sig = {k: tf.TensorSpec((batch_size,) + tuple(s.shape), tf.float32, name=k) for k, s in obs_spec.items()}
    rnn_sig = tf.TensorSpec(tuple(rnn_state.shape), tf.float32, name="rnn_state")
    module.infer = tf.function(tf_fn, input_signature=[obs_sig, rnn_sig], autograph=False)

    concrete = module.infer.get_concrete_function(obs_sig, rnn_sig)
    op_types = {op.type for op in concrete.graph.get_operations()}
    if "XlaCallModule" in op_types:
        serialization = "native (StableHLO-in-TF; NOT tf2onnx-convertible)"
        log.warning(
            "jax %s only supports native jax2tf serialization: the SavedModel wraps "
            "StableHLO in an XlaCallModule op, which tf2onnx cannot convert. "
            "Use export_onnx (direct ONNX export) or the StableHLO artifact instead.",
            jax.__version__,
        )
    else:
        serialization = "graph (tf2onnx-convertible)"

    output_path = output_path or join(experiment_dir(cfg), f"policy_p{cfg.policy_index}_saved_model")
    tf.saved_model.save(module, output_path, signatures={"serving_default": module.infer})
    log.info("Exported policy SavedModel (%s) to %s", serialization, output_path)
    return output_path


def main() -> int:
    """CLI: export a trained policy. --export_format=stablehlo (default) writes
    a jax.export artifact; saved_model writes the TF SavedModel for the ONNX
    recipe above."""
    import argparse

    from sample_factory_tpu.cfg.arguments import parse_full_cfg, parse_sf_args

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--export_format", choices=["stablehlo", "saved_model"], default="stablehlo")
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
    if known.export_format == "saved_model":
        export_tf_saved_model(cfg, known.export_batch_size, known.export_output)
    else:
        export_model(cfg, known.export_batch_size, known.export_output)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
