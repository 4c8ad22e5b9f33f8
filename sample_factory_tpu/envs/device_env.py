"""On-device (jittable) environment API.

This is the TPU-native replacement for the reference's process-parallel env
stepping (reference `algo/sampling/rollout_worker.py` + `batched_sampling.py`):
instead of N worker processes each stepping M envs and shipping slices through
shared memory, a DeviceEnv defines pure `reset`/`step` functions that are
`vmap`ed over thousands of env instances and `lax.scan`ed over rollout steps
inside one XLA program per host.

Contract (single unbatched env; vectorization is applied by the sampler):
    reset(key, state_like=None) -> (obs_dict, state)
    step(key, state, action)    -> (obs_dict, state, reward, terminated, truncated, info)
  - obs_dict: dict[str, array] matching `obs_space` (always dict; scalar obs
    under key "obs", like the reference's dict-wrapping)
  - state: any pytree; static shapes
  - reward: f32 scalar; terminated/truncated: bool scalars
  - info: dict of f32/bool scalars (fixed keys; e.g. {"time_outs": ...})

Episode boundary semantics are the reference's (gymnasium API): `terminated`
is a true MDP termination, `truncated` a timeout — the learner bootstraps
values on truncation when --value_bootstrap is set (reference learner.py:980).
Auto-reset is applied by `autoreset_step`: on done the state/obs are replaced
with a fresh reset, matching the reference's BatchedVecEnv behavior.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


class DeviceEnv:
    """Base class. Subclasses define obs_space / action_space / num_agents and
    pure reset/step. Instances must be cheap, stateless containers of static
    parameters (they are closed over by jitted functions)."""

    obs_space: Any = None
    action_space: Any = None
    num_agents: int = 1
    frameskip: int = 1
    # optional reward shaping dict exposed to PBT (reference RewardShapingInterface)
    reward_shaping: Dict[str, float] = {}
    # True when step_shaped consumes shaping as RUNTIME arrays — PBT can then
    # mutate shaping between iterations without recompiling the rollout
    supports_dynamic_shaping: bool = False

    def reset(self, key) -> Tuple[Dict[str, jnp.ndarray], Any]:
        raise NotImplementedError

    def step(self, key, state, action):
        raise NotImplementedError

    def step_shaped(self, key, state, action, shaping: Dict[str, jnp.ndarray]):
        """step() with reward-shaping coefficients passed as runtime scalars
        (traced values, not Python floats). Envs that support PBT reward
        shaping on device override this and set supports_dynamic_shaping."""
        return self.step(key, state, action)

    def update_reward_shaping(self, reward_shaping: Dict[str, float]) -> "DeviceEnv":
        """Return a copy with new shaping params (PBT hook); default: no-op.
        Static fallback — triggers recompilation; prefer step_shaped."""
        return self

    def render_frame(self, state):
        """Optional host-side rendering for enjoy.py; returns an HWC uint8 array or None."""
        return None


def autoreset_step(env: DeviceEnv, key, state, action, shaping=None):
    """Step + masked auto-reset on episode end.

    Returns (obs, state, reward, done, info) where `info` contains at least
    `terminated`, `truncated`, and `time_outs` (truncated-only flag used for
    value bootstrap, reference learner.py:984-990).
    """
    step_key, reset_key = jax.random.split(key)
    if shaping is not None and env.supports_dynamic_shaping:
        obs, new_state, reward, terminated, truncated, info = env.step_shaped(step_key, state, action, shaping)
    else:
        obs, new_state, reward, terminated, truncated, info = env.step(step_key, state, action)
    done = jnp.logical_or(terminated, truncated)

    reset_obs, reset_state = env.reset(reset_key)
    new_state = jax.tree.map(lambda r, s: jnp.where(_bcast(done, s), r, s), reset_state, new_state)
    obs = {k: jnp.where(_bcast(done, v), reset_obs[k], v) for k, v in obs.items()}

    info = dict(info)
    info["terminated"] = terminated
    info["truncated"] = truncated
    info["time_outs"] = jnp.logical_and(truncated, jnp.logical_not(terminated))
    return obs, new_state, reward, done, info


def _bcast(flag, x):
    """Broadcast a scalar bool against an arbitrary-rank value."""
    return jnp.reshape(flag, (1,) * x.ndim) if x.ndim > 0 else flag


def autoreset_step_ma(env: DeviceEnv, key, state, actions, shaping=None):
    """Multi-agent variant of autoreset_step: obs/reward/terminated/truncated
    carry a leading agent axis [A, ...]; the env resets when ALL agents are
    done (the host multi-agent convention, algo/host_sampling.py all_done;
    reference non_batched_sampling.py finalizes at episode end for all
    agents). Returns per-agent done/info arrays."""
    step_key, reset_key = jax.random.split(key)
    if shaping is not None and env.supports_dynamic_shaping:
        obs, new_state, reward, terminated, truncated, info = env.step_shaped(step_key, state, actions, shaping)
    else:
        obs, new_state, reward, terminated, truncated, info = env.step(step_key, state, actions)
    done = jnp.logical_or(terminated, truncated)  # [A]
    done_env = jnp.all(done)

    reset_obs, reset_state = env.reset(reset_key)
    new_state = jax.tree.map(lambda r, s: jnp.where(_bcast(done_env, s), r, s), reset_state, new_state)
    obs = {k: jnp.where(_bcast(done_env, v), reset_obs[k], v) for k, v in obs.items()}

    info = dict(info)
    info["terminated"] = terminated
    info["truncated"] = truncated
    info["time_outs"] = jnp.logical_and(truncated, jnp.logical_not(terminated))
    info.setdefault("active", jnp.ones_like(done))
    # every agent's episode closes when the env resets
    return obs, new_state, reward, jnp.broadcast_to(done_env, done.shape), info


def vector_reset(env: DeviceEnv, key, num_envs: int):
    keys = jax.random.split(key, num_envs)
    return jax.vmap(env.reset)(keys)


def vector_step(env: DeviceEnv, key, states, actions, shaping=None):
    num_envs = jax.tree.leaves(states)[0].shape[0]
    keys = jax.random.split(key, num_envs)
    # shaping is shared across the env vector (per-policy, not per-env): close
    # over it instead of vmapping it
    return jax.vmap(lambda k, s, a: autoreset_step(env, k, s, a, shaping))(keys, states, actions)


def vector_step_ma(env: DeviceEnv, key, states, actions, shaping=None):
    """Multi-agent vector step. actions [N, A, ...]; shaping, if given, has
    leaves [N, A] (per-agent coefficients — mixed-policy self-play assigns
    each agent its own policy's PBT-mutated shaping)."""
    num_envs = jax.tree.leaves(states)[0].shape[0]
    keys = jax.random.split(key, num_envs)
    if shaping is None:
        return jax.vmap(lambda k, s, a: autoreset_step_ma(env, k, s, a))(keys, states, actions)
    return jax.vmap(lambda k, s, a, sh: autoreset_step_ma(env, k, s, a, sh))(keys, states, actions, shaping)
