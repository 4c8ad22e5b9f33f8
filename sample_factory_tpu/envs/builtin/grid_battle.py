"""GridBattle: an on-device pixel combat env (the ViZDoom-battle analog).

A pure-JAX, fully jittable pixel environment for benchmarking and testing the
conv+RNN path at device speed: the agent moves on a grid, shoots enemies that
chase it, manages health — pixel observations, discrete actions, episodic
structure with both termination (death) and truncation (time limit).

This is original content (not a port): it exists because the reference's
pixel-throughput benchmarks (ViZDoom) need a C++ game engine, while on TPU the
highest-throughput regime is envs that live inside the XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sample_factory_tpu.envs.device_env import DeviceEnv
from sample_factory_tpu.envs.spaces import Box, Discrete, make_dict_spec

# actions: 0..3 move NSEW, 4 shoot, 5 idle. Kept as numpy at module level —
# a module-level jnp array would initialize the JAX backend at import time,
# before run_rl applies --device.
MOVES = np.asarray([[-1, 0], [1, 0], [0, -1], [0, 1], [0, 0], [0, 0]], np.int32)


class GridBattleEnv(DeviceEnv):
    def __init__(self, size: int = 24, num_enemies: int = 8, episode_len: int = 256, shoot_range: int = 6):
        self.size = size
        self.num_enemies = num_enemies
        self.episode_len = episode_len
        self.shoot_range = shoot_range
        self.obs_space = make_dict_spec({"obs": Box((size, size, 3), 0.0, 1.0)})
        self.action_space = Discrete(6)
        self.reward_shaping = {"kill_reward": 1.0, "hit_penalty": 0.2}
        # shaping coefficients enter step_shaped as runtime scalars, so PBT
        # mutations never trigger recompilation
        self.supports_dynamic_shaping = True

    def update_reward_shaping(self, reward_shaping):
        env = GridBattleEnv(self.size, self.num_enemies, self.episode_len, self.shoot_range)
        env.reward_shaping = dict(reward_shaping)
        return env

    # ------------------------------------------------------------------ state

    def _render_obs(self, state):
        size = self.size
        img = jnp.zeros((size, size, 3))
        img = img.at[state["agent"][0], state["agent"][1], 0].set(1.0)
        ex, ey = state["enemies"][:, 0], state["enemies"][:, 1]
        alive = state["alive"].astype(jnp.float32)
        img = img.at[ex, ey, 1].add(alive)
        # health bar along the top row of channel 2
        health_cols = jnp.arange(size) < (state["health"] * size / 5.0)
        img = img.at[0, :, 2].set(health_cols.astype(jnp.float32))
        return {"obs": jnp.clip(img, 0.0, 1.0)}

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        agent = jnp.full((2,), self.size // 2, jnp.int32)
        enemies = jax.random.randint(k1, (self.num_enemies, 2), 0, self.size)
        state = {
            "agent": agent,
            "enemies": enemies,
            "alive": jnp.ones(self.num_enemies, bool),
            "health": jnp.asarray(5.0),
            "steps": jnp.zeros((), jnp.int32),
        }
        return self._render_obs(state), state

    def step(self, key, state, action):
        shaping = {k: jnp.asarray(v, jnp.float32) for k, v in self.reward_shaping.items()}
        return self.step_shaped(key, state, action, shaping)

    def step_shaped(self, key, state, action, shaping):
        a = action[..., 0].astype(jnp.int32) if action.ndim > 0 else action.astype(jnp.int32)
        k_move, k_spawn = jax.random.split(key)

        agent = jnp.clip(state["agent"] + jnp.asarray(MOVES)[a], 0, self.size - 1)

        # enemies chase: step one cell toward the agent (with a random stall)
        delta = jnp.sign(agent[None, :] - state["enemies"])
        stall = jax.random.bernoulli(k_move, 0.5, (self.num_enemies, 1))
        enemies = jnp.clip(state["enemies"] + delta * (1 - stall.astype(jnp.int32)), 0, self.size - 1)

        # shooting: kill the nearest alive enemy in the same row or column
        # within range
        diff = enemies - agent[None, :]
        same_row = (diff[:, 0] == 0) & (jnp.abs(diff[:, 1]) <= self.shoot_range)
        same_col = (diff[:, 1] == 0) & (jnp.abs(diff[:, 0]) <= self.shoot_range)
        in_sights = (same_row | same_col) & state["alive"]
        dist = jnp.abs(diff).sum(-1)
        target_score = jnp.where(in_sights, dist, 10**6)
        target = jnp.argmin(target_score)
        shot_hits = (a == 4) & (target_score[target] < 10**6)
        alive = state["alive"] & ~(shot_hits & (jnp.arange(self.num_enemies) == target))
        kills = jnp.sum(state["alive"]) - jnp.sum(alive)

        # enemy contact damages the agent
        contact = jnp.sum((jnp.abs(enemies - agent[None, :]).sum(-1) <= 1) & alive)
        health = state["health"] - 0.5 * contact.astype(jnp.float32)

        # dead enemies respawn at a random border cell (endless battle)
        spawn = jax.random.randint(k_spawn, (self.num_enemies, 2), 0, self.size)
        respawn = jax.random.bernoulli(k_spawn, 0.05, (self.num_enemies,)) & ~alive
        enemies = jnp.where(respawn[:, None], spawn, enemies)
        alive = alive | respawn

        reward = (
            kills.astype(jnp.float32) * shaping["kill_reward"]
            - shaping["hit_penalty"] * contact.astype(jnp.float32)
        )
        steps = state["steps"] + 1
        terminated = health <= 0.0
        truncated = steps >= self.episode_len

        new_state = {"agent": agent, "enemies": enemies, "alive": alive, "health": health, "steps": steps}
        return self._render_obs(new_state), new_state, reward.astype(jnp.float32), terminated, truncated, {}


def make_grid_battle_env(full_env_name: str, cfg=None, env_config=None, render_mode=None):
    return GridBattleEnv()
