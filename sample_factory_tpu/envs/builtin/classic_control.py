"""Jittable classic-control environments (CartPole, Pendulum).

Dynamics follow the standard published formulations (Barto-Sutton-Anderson
cart-pole; underactuated pendulum swing-up as in gymnasium), implemented from
the equations of motion for TPU execution. These are the CPU-free analogs of
the reference's gym classic-control integration (reference
`sf_examples/train_gym_env.py` uses gym CartPole-v1 as its smoke-test env).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from sample_factory_tpu.envs.device_env import DeviceEnv
from sample_factory_tpu.envs.spaces import Box, Discrete, make_dict_spec


class CartPoleEnv(DeviceEnv):
    """Cart-pole balancing. Discrete(2); reward 1 per step; 500-step limit."""

    gravity = 9.8
    masscart = 1.0
    masspole = 0.1
    total_mass = masscart + masspole
    length = 0.5  # half pole length
    polemass_length = masspole * length
    force_mag = 10.0
    tau = 0.02
    theta_threshold = 12 * 2 * math.pi / 360
    x_threshold = 2.4
    max_steps = 500

    obs_space = make_dict_spec({"obs": Box((4,))})
    action_space = Discrete(2)

    def reset(self, key):
        s = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        state = {"s": s, "steps": jnp.zeros((), jnp.int32)}
        return {"obs": s}, state

    def step(self, key, state, action):
        x, x_dot, theta, theta_dot = state["s"][0], state["s"][1], state["s"][2], state["s"][3]
        a = action[..., 0].astype(jnp.int32) if action.ndim > 0 else action.astype(jnp.int32)
        force = jnp.where(a == 1, self.force_mag, -self.force_mag)

        costheta, sintheta = jnp.cos(theta), jnp.sin(theta)
        temp = (force + self.polemass_length * theta_dot**2 * sintheta) / self.total_mass
        thetaacc = (self.gravity * sintheta - costheta * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * costheta**2 / self.total_mass)
        )
        xacc = temp - self.polemass_length * thetaacc * costheta / self.total_mass

        x = x + self.tau * x_dot
        x_dot = x_dot + self.tau * xacc
        theta = theta + self.tau * theta_dot
        theta_dot = theta_dot + self.tau * thetaacc

        s = jnp.stack([x, x_dot, theta, theta_dot])
        steps = state["steps"] + 1
        terminated = (jnp.abs(x) > self.x_threshold) | (jnp.abs(theta) > self.theta_threshold)
        truncated = steps >= self.max_steps
        reward = jnp.ones((), jnp.float32)
        return {"obs": s}, {"s": s, "steps": steps}, reward, terminated, truncated, {}


class PendulumEnv(DeviceEnv):
    """Pendulum swing-up. Box(1) torque in [-2, 2]; 200-step limit."""

    max_speed = 8.0
    max_torque = 2.0
    dt = 0.05
    g = 10.0
    m = 1.0
    length = 1.0
    max_steps = 200

    obs_space = make_dict_spec({"obs": Box((3,))})
    action_space = Box((1,), -2.0, 2.0)

    def _obs(self, th, thdot):
        return {"obs": jnp.stack([jnp.cos(th), jnp.sin(th), thdot])}

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        th = jax.random.uniform(k1, (), minval=-math.pi, maxval=math.pi)
        thdot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        state = {"th": th, "thdot": thdot, "steps": jnp.zeros((), jnp.int32)}
        return self._obs(th, thdot), state

    def step(self, key, state, action):
        th, thdot = state["th"], state["thdot"]
        u = jnp.clip(action[..., 0] if action.ndim > 0 else action, -self.max_torque, self.max_torque)

        angle_norm = ((th + math.pi) % (2 * math.pi)) - math.pi
        cost = angle_norm**2 + 0.1 * thdot**2 + 0.001 * u**2

        newthdot = thdot + (3 * self.g / (2 * self.length) * jnp.sin(th) + 3.0 / (self.m * self.length**2) * u) * self.dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        newth = th + newthdot * self.dt

        steps = state["steps"] + 1
        truncated = steps >= self.max_steps
        terminated = jnp.zeros((), bool)
        return (
            self._obs(newth, newthdot),
            {"th": newth, "thdot": newthdot, "steps": steps},
            -cost.astype(jnp.float32),
            terminated,
            truncated,
            {},
        )
