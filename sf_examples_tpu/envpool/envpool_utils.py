"""EnvPool integration: batched C++ env stepping feeding the host pipeline.

Parity: reference `sf_examples/envpool/` (envpool as the high-performance
batched CPU env backend). An EnvPool instance already steps a whole batch in
C++ threads, so it maps to ONE host worker with a large vector instead of many
single-env workers — set --num_workers=1 and --env_agents to the pool size.
Gated on envpool availability.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def envpool_available() -> bool:
    try:
        import envpool  # noqa: F401

        return True
    except ImportError:
        return False


class EnvPoolBatchedEnv:
    """gymnasium-like facade over an envpool batch (obs/reward arrays carry the
    pool's batch dim; used with num_envs_per_worker == pool size)."""

    def __init__(self, task_id: str, num_envs: int, seed: int = 0, **kwargs):
        import envpool

        self.pool = envpool.make(task_id, env_type="gymnasium", num_envs=num_envs, seed=seed, **kwargs)
        self.num_envs = num_envs
        self.observation_space = self.pool.observation_space
        self.action_space = self.pool.action_space

    def reset(self, seed=None, **kwargs):
        return self.pool.reset()

    def step(self, actions):
        return self.pool.step(np.asarray(actions))

    def close(self):
        self.pool.close()


def make_envpool_env(env_name: str, cfg=None, env_config=None, render_mode: Optional[str] = None):
    if not envpool_available():
        raise RuntimeError("envpool is not installed; pip install envpool")
    # env_name convention: envpool_<TaskId>, e.g. envpool_Breakout-v5
    task_id = env_name.split("envpool_", 1)[1]
    num_envs = cfg.num_envs_per_worker if cfg is not None else 1
    return EnvPoolBatchedEnv(task_id, num_envs=num_envs, seed=cfg.seed if cfg else 0)


def register_envpool_env(env_name: str) -> None:
    from sample_factory_tpu.envs.env_utils import register_env

    register_env(env_name, make_envpool_env)
