"""GridDuel: an on-device 2-agent self-play combat env (the doom-duel analog).

The device-path multi-agent testbed (reference trains duels with networked
ViZDoom instances + PBT, `sf_examples/vizdoom/experiments/doom_duel.py`): two
agents on one grid shoot at each other; each agent is (potentially) driven by
a DIFFERENT policy of the population — the within-env policy-mixing regime
(reference `algo/utils/agent_policy_mapping.py:47-59`,
`non_batched_sampling.py:25-313` per-agent policies).

Multi-agent DeviceEnv contract (num_agents = A): reset/step return per-agent
obs/reward/terminated/truncated with a LEADING AGENT AXIS ([A, ...]); step
takes actions [A, ...]; info carries "active" [A]. The mixed-policy sampler
flattens agents into policy slots (algo/sampling.py make_mixed_rollout_fn).

Observations are egocentric: each agent sees itself in channel 0, the
opponent in channel 1, own health in channel 2 — so ONE policy net serves
either seat, and self-play weights are seat-symmetric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sample_factory_tpu.envs.device_env import DeviceEnv
from sample_factory_tpu.envs.spaces import Box, Discrete, make_dict_spec

# actions: 0..3 move NSEW, 4 shoot, 5 idle. Kept as numpy at module level —
# a module-level jnp array would initialize the JAX backend at import time,
# before run_rl applies --device (registration imports this module).
MOVES = np.asarray([[-1, 0], [1, 0], [0, -1], [0, 1], [0, 0], [0, 0]], np.int32)


class GridDuelEnv(DeviceEnv):
    num_agents = 2

    def __init__(self, size: int = 16, episode_len: int = 256, shoot_range: int = 6, health: float = 3.0):
        self.size = size
        self.episode_len = episode_len
        self.shoot_range = shoot_range
        self.max_health = health
        self.obs_space = make_dict_spec({"obs": Box((size, size, 3), 0.0, 1.0)})
        self.action_space = Discrete(6)
        self.reward_shaping = {"hit_reward": 1.0, "hit_penalty": 0.5, "win_reward": 2.0}
        self.supports_dynamic_shaping = True

    def update_reward_shaping(self, reward_shaping):
        env = GridDuelEnv(self.size, self.episode_len, self.shoot_range, self.max_health)
        env.reward_shaping = dict(reward_shaping)
        return env

    # ------------------------------------------------------------------ state

    def _render_obs(self, state):
        """Egocentric per-agent images [2, S, S, 3]."""
        size = self.size
        pos, health = state["pos"], state["health"]

        def one(me, other, hp):
            img = jnp.zeros((size, size, 3))
            img = img.at[pos[me, 0], pos[me, 1], 0].set(1.0)
            img = img.at[pos[other, 0], pos[other, 1], 1].set(1.0)
            cols = jnp.arange(size) < (hp * size / self.max_health)
            img = img.at[0, :, 2].set(cols.astype(jnp.float32))
            return img

        return {"obs": jnp.stack([one(0, 1, health[0]), one(1, 0, health[1])])}

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        # spawn in opposite quadrants (randomized within each)
        q = self.size // 3
        p0 = jax.random.randint(k1, (2,), 0, q)
        p1 = self.size - 1 - jax.random.randint(k2, (2,), 0, q)
        state = {
            "pos": jnp.stack([p0, p1]).astype(jnp.int32),
            "health": jnp.full((2,), self.max_health),
            "steps": jnp.zeros((), jnp.int32),
        }
        return self._render_obs(state), state

    def step(self, key, state, action):
        shaping = {k: jnp.asarray(v, jnp.float32) for k, v in self.reward_shaping.items()}
        return self.step_shaped(key, state, action, shaping)

    def step_shaped(self, key, state, action, shaping):
        a = action[..., 0].astype(jnp.int32) if action.ndim > 1 else action.astype(jnp.int32)  # [2]
        pos = jnp.clip(state["pos"] + jnp.asarray(MOVES)[a], 0, self.size - 1)

        # simultaneous shots: agent i hits agent j when shooting and j is in
        # the same row or column within range
        diff = pos[::-1] - pos  # [2, 2]: opponent - self
        aligned = (diff[:, 0] == 0) & (jnp.abs(diff[:, 1]) <= self.shoot_range) | (
            (diff[:, 1] == 0) & (jnp.abs(diff[:, 0]) <= self.shoot_range)
        )
        shoots = a == 4
        hits = shoots & aligned  # [2]: agent i hit its opponent
        damage_taken = hits[::-1].astype(jnp.float32)  # agent i takes opponent's hit
        health = state["health"] - damage_taken

        dead = health <= 0.0
        i_won = dead[::-1] & ~dead  # opponent died, i alive
        reward = (
            hits.astype(jnp.float32) * shaping["hit_reward"]
            - damage_taken * shaping["hit_penalty"]
            + i_won.astype(jnp.float32) * shaping["win_reward"]
        )

        steps = state["steps"] + 1
        any_dead = jnp.any(dead)
        terminated = jnp.broadcast_to(any_dead, (2,))
        truncated = jnp.broadcast_to((~any_dead) & (steps >= self.episode_len), (2,))

        new_state = {"pos": pos, "health": health, "steps": steps}
        info = {"active": jnp.ones((2,), bool)}
        return self._render_obs(new_state), new_state, reward.astype(jnp.float32), terminated, truncated, info


def make_grid_duel_env(full_env_name: str, cfg=None, env_config=None, render_mode=None):
    if full_env_name == "grid_duel_small":
        # dense-combat tuning for CI learning tests: long row/col reach and
        # enough health that episodes see multiple exchanges
        return GridDuelEnv(size=12, episode_len=96, shoot_range=10, health=3.0)
    return GridDuelEnv()


def register_grid_duel() -> None:
    from sample_factory_tpu.envs.env_utils import register_env

    register_env("grid_duel", make_grid_duel_env)
    register_env("grid_duel_small", make_grid_duel_env)
