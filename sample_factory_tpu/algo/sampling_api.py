"""Library-style sampling APIs: collect trajectories without a learner.

Parity: reference `sample_factory/algo/sampling/sync_sampling_api.py:16`
(SyncSamplingAPI.get_trajectories_sync) and
`evaluation_sampling_api.py:31,234` (SamplingLoop / EvalSamplingAPI used by
fast eval). One class serves both on-device and host envs; the trajectory
format is the framework's standard [T, N, ...] pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from sample_factory_tpu.algo.learning import PolicyTrainState, init_train_state, make_train_fn
from sample_factory_tpu.algo.optimizers import make_optimizer
from sample_factory_tpu.algo.sampling import init_sampler_state, make_rollout_fn
from sample_factory_tpu.envs.device_env import DeviceEnv
from sample_factory_tpu.envs.env_info import EnvInfo, obtain_env_info
from sample_factory_tpu.envs.env_utils import create_env
from sample_factory_tpu.models.actor_critic import create_actor_critic
from sample_factory_tpu.runner.checkpoint import load_checkpoint
from sample_factory_tpu.utils.utils import log


class SyncSamplingAPI:
    """Blocking trajectory collection with the current (or checkpointed) policy."""

    def __init__(self, cfg, env_info: Optional[EnvInfo] = None, register_fn: Optional[Callable] = None,
                 load_from_checkpoint: bool = False):
        self.cfg = cfg
        self.register_fn = register_fn
        self.env_info = env_info or obtain_env_info(cfg, register_fn=register_fn)
        self.model = create_actor_critic(cfg, self.env_info.obs_space, self.env_info.action_space)
        self.tx = make_optimizer(cfg)
        self.key = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 0)

        self._device_env = None
        self._host_sampler = None
        self._rollout_fn = None
        self._sampler_state = None
        self.train_state: Optional[PolicyTrainState] = None
        self._load_ckpt = load_from_checkpoint
        self.episodic: List[Tuple[float, int]] = []

    def start(self, train_state: Optional[PolicyTrainState] = None) -> None:
        cfg = self.cfg
        k_env, k_model, self.key = jax.random.split(self.key, 3)
        if self.env_info.is_device_env:
            self._device_env = create_env(cfg.env, cfg=cfg, env_config=None)
            self._sampler_state = init_sampler_state(cfg, self._device_env, k_env, cfg.num_envs)
            example_obs = {k: v[:2] for k, v in self._sampler_state.obs.items()}
            self._rollout_fn = jax.jit(
                make_rollout_fn(cfg, self._device_env, self.env_info, self.model), static_argnums=(4,)
            )
        else:
            from sample_factory_tpu.algo.host_sampling import HostVectorSampler

            self._host_sampler = HostVectorSampler(cfg, self.env_info, self.model, register_fn=self.register_fn)
            self._host_sampler.start()
            cfg.num_envs = self._host_sampler.num_envs
            example_obs = {k: jnp.asarray(v[:2]) for k, v in self._host_sampler._split_obs(0).items()}

        if train_state is not None:
            self.train_state = train_state
        else:
            self.train_state = init_train_state(cfg, self.env_info, self.model, self.tx, k_model, example_obs)
            if self._load_ckpt:
                restored = load_checkpoint(cfg, cfg.policy_index, self.train_state)
                if restored is not None:
                    self.train_state = restored[0]

    def set_train_state(self, train_state: PolicyTrainState) -> None:
        """The analog of the reference's parameter-server weight update."""
        self.train_state = train_state

    def get_trajectories_sync(self) -> Dict[str, Any]:
        """Collect one rollout's worth of trajectories from all envs."""
        ts = self.train_state
        self.key, k = jax.random.split(self.key)
        version = ts.train_step
        if self._device_env is not None:
            self._sampler_state, traj, ep_stats = self._rollout_fn(
                ts.params, ts.obs_rms, self._sampler_state, version, int(self.cfg.policy_index)
            )
            self._last_ep_stats = jax.device_get(ep_stats)
        else:
            traj, stats = self._host_sampler.collect_rollout(
                ts.params, ts.obs_rms, k, int(jax.device_get(version)), self.cfg.policy_index
            )
            self.episodic.extend(self._host_sampler.episodic)
            self._last_ep_stats = stats
        return traj

    def stop(self) -> None:
        if self._host_sampler is not None:
            self._host_sampler.close()


class EvalSamplingAPI(SyncSamplingAPI):
    """Evaluation sampler: loads the checkpoint and accumulates episode stats."""

    def __init__(self, cfg, env_info: Optional[EnvInfo] = None, register_fn: Optional[Callable] = None):
        super().__init__(cfg, env_info, register_fn, load_from_checkpoint=True)

    def sample_episodes(self, num_episodes: int) -> List[Tuple[float, int]]:
        episodes: List[Tuple[float, int]] = []
        while len(episodes) < num_episodes:
            self.get_trajectories_sync()
            if self._host_sampler is not None:
                episodes = list(self.episodic)
            else:
                # device path: count completed episodes from the aggregate stats
                stats = self._last_ep_stats
                n = int(stats["count"])
                if n:
                    avg_r = float(stats["return_sum"]) / n
                    avg_l = float(stats["len_sum"]) / n
                    episodes.extend([(avg_r, int(avg_l))] * n)
        return episodes[:num_episodes]
