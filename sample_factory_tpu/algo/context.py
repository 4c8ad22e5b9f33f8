"""Per-process global context: env registry + model factory.

Parity: reference `sample_factory/algo/utils/context.py:7-34` (global context
pickled into workers) and `sample_factory/model/model_factory.py` (register_*
hooks). On TPU there are no worker processes to pickle into for the hot path,
but host-env workers still inherit this context, and tests reset it between
runs (reference reset_global_context, context.py:28-34).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional


class ModelFactory:
    """User-overridable factories (reference model_factory.py:31-60)."""

    def __init__(self):
        self.encoder_factory: Optional[Callable] = None
        self.core_factory: Optional[Callable] = None
        self.decoder_factory: Optional[Callable] = None
        self.actor_critic_factory: Optional[Callable] = None

    def register_encoder_factory(self, fn: Callable) -> None:
        """fn(cfg, obs_space) -> flax Module"""
        self.encoder_factory = fn

    def register_model_core_factory(self, fn: Callable) -> None:
        """fn(cfg) -> flax Module"""
        self.core_factory = fn

    def register_decoder_factory(self, fn: Callable) -> None:
        """fn(cfg) -> flax Module"""
        self.decoder_factory = fn

    def register_actor_critic_factory(self, fn: Callable) -> None:
        """fn(cfg, obs_space, action_space) -> flax Module"""
        self.actor_critic_factory = fn


class SfTpuContext:
    def __init__(self):
        self.env_registry: Dict[str, object] = {}
        self.model_factory = ModelFactory()


_GLOBAL_CONTEXT: Optional[SfTpuContext] = None


def sf_global_context() -> SfTpuContext:
    global _GLOBAL_CONTEXT
    if _GLOBAL_CONTEXT is None:
        _GLOBAL_CONTEXT = SfTpuContext()
    return _GLOBAL_CONTEXT


def set_global_context(ctx: SfTpuContext) -> None:
    global _GLOBAL_CONTEXT
    _GLOBAL_CONTEXT = ctx


def reset_global_context() -> None:
    global _GLOBAL_CONTEXT
    _GLOBAL_CONTEXT = None


def global_model_factory() -> ModelFactory:
    return sf_global_context().model_factory


def global_env_registry() -> Dict[str, object]:
    return sf_global_context().env_registry
