"""Actor-critic models: shared-weights and separate-weights variants.

Parity: reference `sample_factory/model/actor_critic.py` — ActorCritic (:23),
ActorCriticSharedWeights (:136), ActorCriticSeparateWeights (:198),
create_actor_critic (:337). TPU-native differences:
  - pure flax modules; parameters are pytrees, state (normalizers) lives in the
    train state, not inside the module (reference keeps normalizers in the
    torch module, :30-39 — we checkpoint them together, see runner.checkpoint)
  - the core is a single-step cell; sequences are scanned outside
  - distribution objects are created functionally from the returned raw params

Module API (used via `.apply(variables, ..., method=...)`):
  forward_head(obs_dict) -> head_out
  forward_core(head_out, rnn_state) -> (core_out, new_state)
  forward_tail(core_out) -> (action_params_raw, values)
  __call__(obs_dict, rnn_state) -> (action_params_raw, values, new_rnn_state)
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sample_factory_tpu.envs.spaces import is_continuous_action_space
from sample_factory_tpu.models.action_parameterization import (
    ActionParameterizationContinuousNonAdaptiveStddev,
    ActionParameterizationDefault,
)
from sample_factory_tpu.models.core import ModelCoreIdentity, default_make_core, initial_rnn_state
from sample_factory_tpu.models.decoder import default_make_decoder
from sample_factory_tpu.models.encoder import default_make_encoder
from sample_factory_tpu.models.model_utils import bias_initializer, default_compute_dtype, kernel_initializer


def _make_action_parameterization(cfg, action_space, dtype):
    if not cfg.adaptive_stddev and is_continuous_action_space(action_space):
        return ActionParameterizationContinuousNonAdaptiveStddev(cfg, action_space, dtype=dtype)
    return ActionParameterizationDefault(cfg, action_space, dtype=dtype)


class ActorCriticSharedWeights(nn.Module):
    """encoder -> core -> decoder -> (critic linear, action head) (reference :136-196)."""

    cfg: Any
    obs_space: Any
    action_space: Any
    make_encoder: Optional[Callable] = None
    make_core: Optional[Callable] = None
    make_decoder: Optional[Callable] = None

    def setup(self):
        dtype = default_compute_dtype(self.cfg)
        enc_fn = self.make_encoder or (lambda cfg, obs_space: default_make_encoder(cfg, obs_space, dtype=dtype))
        core_fn = self.make_core or (lambda cfg: default_make_core(cfg, dtype=dtype))
        dec_fn = self.make_decoder or (lambda cfg: default_make_decoder(cfg, dtype=dtype))
        self.encoder = enc_fn(self.cfg, self.obs_space)
        self.core = core_fn(self.cfg)
        self.decoder = dec_fn(self.cfg)
        self.critic_linear = nn.Dense(
            1, kernel_init=kernel_initializer(self.cfg), bias_init=bias_initializer(self.cfg), dtype=dtype
        )
        self.action_parameterization = _make_action_parameterization(self.cfg, self.action_space, dtype)

    def forward_head(self, obs_dict):
        return self.encoder(obs_dict)

    def forward_core(self, head_output, rnn_state):
        return self.core(head_output, rnn_state)

    def forward_core_seq(self, head_seq, rnn_state, resets):
        """BPTT: head_seq [T, B, D], rnn_state [B, S], resets [T, B] ->
        (core_out [T, B, H], final_state). Uses the fused-scan cell path."""
        return self.core(head_seq, rnn_state, resets=resets, seq=True)

    def forward_tail(self, core_output) -> Tuple[jnp.ndarray, jnp.ndarray]:
        decoded = self.decoder(core_output)
        values = self.critic_linear(decoded).astype(jnp.float32)[..., 0]
        action_params = self.action_parameterization(decoded)
        return action_params, values

    def __call__(self, obs_dict, rnn_state):
        x = self.forward_head(obs_dict)
        x, new_state = self.forward_core(x, rnn_state)
        action_params, values = self.forward_tail(x)
        return action_params, values, new_state


class ActorCriticSeparateWeights(nn.Module):
    """Two towers (actor/critic), each encoder->core->decoder (reference :198-334).

    The flat RNN state is the concatenation [actor_state || critic_state]; the
    head output is the concatenation [actor_head || critic_head] so the
    head/core/tail API stays identical to the shared-weights variant.
    """

    cfg: Any
    obs_space: Any
    action_space: Any
    make_encoder: Optional[Callable] = None
    make_core: Optional[Callable] = None
    make_decoder: Optional[Callable] = None

    def setup(self):
        dtype = default_compute_dtype(self.cfg)
        enc_fn = self.make_encoder or (lambda cfg, obs_space: default_make_encoder(cfg, obs_space, dtype=dtype))
        core_fn = self.make_core or (lambda cfg: default_make_core(cfg, dtype=dtype))
        dec_fn = self.make_decoder or (lambda cfg: default_make_decoder(cfg, dtype=dtype))
        self.actor_encoder = enc_fn(self.cfg, self.obs_space)
        self.actor_core = core_fn(self.cfg)
        self.actor_decoder = dec_fn(self.cfg)
        self.critic_encoder = enc_fn(self.cfg, self.obs_space)
        self.critic_core = core_fn(self.cfg)
        self.critic_decoder = dec_fn(self.cfg)
        self.critic_linear = nn.Dense(
            1, kernel_init=kernel_initializer(self.cfg), bias_init=bias_initializer(self.cfg), dtype=dtype
        )
        self.action_parameterization = _make_action_parameterization(self.cfg, self.action_space, dtype)

    def _head_split(self, head_output):
        half = head_output.shape[-1] // 2
        return head_output[..., :half], head_output[..., half:]

    def _state_split(self, rnn_state):
        half = rnn_state.shape[-1] // 2
        return rnn_state[..., :half], rnn_state[..., half:]

    def forward_head(self, obs_dict):
        actor_h = self.actor_encoder(obs_dict)
        critic_h = self.critic_encoder(obs_dict)
        return jnp.concatenate([actor_h, critic_h], axis=-1)

    def forward_core(self, head_output, rnn_state):
        actor_h, critic_h = self._head_split(head_output)
        actor_s, critic_s = self._state_split(rnn_state)
        actor_out, new_actor_s = self.actor_core(actor_h, actor_s)
        critic_out, new_critic_s = self.critic_core(critic_h, critic_s)
        return (
            jnp.concatenate([actor_out, critic_out], axis=-1),
            jnp.concatenate([new_actor_s, new_critic_s], axis=-1),
        )

    def forward_core_seq(self, head_seq, rnn_state, resets):
        actor_h, critic_h = self._head_split(head_seq)
        actor_s, critic_s = self._state_split(rnn_state)
        actor_out, new_actor_s = self.actor_core(actor_h, actor_s, resets=resets, seq=True)
        critic_out, new_critic_s = self.critic_core(critic_h, critic_s, resets=resets, seq=True)
        return (
            jnp.concatenate([actor_out, critic_out], axis=-1),
            jnp.concatenate([new_actor_s, new_critic_s], axis=-1),
        )

    def forward_tail(self, core_output):
        actor_out, critic_out = self._head_split(core_output)
        values = self.critic_linear(self.critic_decoder(critic_out)).astype(jnp.float32)[..., 0]
        action_params = self.action_parameterization(self.actor_decoder(actor_out))
        return action_params, values

    def __call__(self, obs_dict, rnn_state):
        x = self.forward_head(obs_dict)
        x, new_state = self.forward_core(x, rnn_state)
        action_params, values = self.forward_tail(x)
        return action_params, values, new_state


def actor_critic_rnn_state_size(cfg) -> int:
    from sample_factory_tpu.models.model_utils import rnn_state_size

    mult = 1 if cfg.actor_critic_share_weights else 2
    return rnn_state_size(cfg) * mult


def initial_actor_critic_state(cfg, batch_size: int) -> jnp.ndarray:
    return jnp.zeros((batch_size, actor_critic_rnn_state_size(cfg)), jnp.float32)


def create_actor_critic(cfg, obs_space, action_space) -> nn.Module:
    """Reference create_actor_critic (:337-351), honoring the model factory."""
    from sample_factory_tpu.algo.context import global_model_factory
    from sample_factory_tpu.utils.static_cfg import StaticConfig

    cfg = StaticConfig(cfg) if not isinstance(cfg, StaticConfig) else cfg
    factory = global_model_factory()
    if factory.actor_critic_factory is not None:
        return factory.actor_critic_factory(cfg, obs_space, action_space)

    cls = ActorCriticSharedWeights if cfg.actor_critic_share_weights else ActorCriticSeparateWeights
    return cls(
        cfg,
        obs_space,
        action_space,
        make_encoder=factory.encoder_factory,
        make_core=factory.core_factory,
        make_decoder=factory.decoder_factory,
    )
