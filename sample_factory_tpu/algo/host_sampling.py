"""Host-env sampler: CPU (gymnasium) envs feeding the device pipeline.

This is the TPU-native replacement for the reference's RolloutWorker processes
+ shared-memory trajectory buffers (reference `algo/sampling/rollout_worker.py`,
`algo/utils/shared_buffers.py`): worker processes step envs and exchange data
with the main process through preallocated SharedMemory slabs (zero-copy, the
analog of the reference's share_memory_() tensors); only tiny control messages
cross the pipe. Double buffering via --worker_num_splits overlaps env stepping
of one split with device inference for the other (the reference's
`advance_rollouts` ping-pong, rollout_worker.py:176-259, without the separate
inference-worker process).

The produced trajectory has the same schema/layout as the on-device sampler
([T, N, ...], T+1 obs/rnn entries), so the same fused learner consumes it.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import pickle
import time
from multiprocessing import shared_memory
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from sample_factory_tpu.algo.distributions import get_action_distribution, sample_actions_log_probs
from sample_factory_tpu.algo.running_mean_std import obs_rms_normalize
from sample_factory_tpu.algo.sampling import _static_preprocess


def _process_rewards_np(cfg, rewards: "np.ndarray") -> "np.ndarray":
    """Reward scale/clip (reference batched_sampling.py:208-214) — NUMPY.

    The host hot loop must never route a tiny array through jnp: an eager
    JAX op + numpy readback synchronizes the host with everything queued on
    the device FIFO (learner quanta, the previous split's inference). One
    jnp.clip here measured 52 ms/call — 92% of the whole pipeline's time
    (r5 profile; the root cause of the r4 ~700 steps/s composition)."""
    rewards = rewards * cfg.reward_scale
    return np.clip(rewards, -cfg.reward_clip, cfg.reward_clip)
from sample_factory_tpu.envs.spaces import action_dtype, num_actions, obs_space_as_dict
from sample_factory_tpu.models.actor_critic import initial_actor_critic_state
from sample_factory_tpu.utils.attr_dict import AttrDict
from sample_factory_tpu.utils.utils import log


# ------------------------------------------------------------------ shm slabs


class ShmSlabs:
    """Preallocated shared-memory arrays for worker<->main data exchange.

    Layout: per array, [num_workers, num_splits, envs_per_split, ...].
    """

    def __init__(self, cfg, env_info, create: bool = True, name_prefix: Optional[str] = None):
        self.cfg = cfg
        W = cfg.num_workers
        K = cfg.worker_num_splits
        A = env_info.num_agents
        E = (cfg.num_envs_per_worker // K) * A  # agent-slots per split
        self.shape_prefix = (W, K, E)

        obs_spec = obs_space_as_dict(env_info.obs_space)
        self._specs: Dict[str, Tuple[tuple, np.dtype]] = {}
        for key, space in obs_spec.items():
            self._specs[f"obs_{key}"] = (self.shape_prefix + tuple(space.shape), np.dtype(getattr(space, "dtype", "float32")))
        a_dt = np.int32 if action_dtype(env_info.action_space) == "int32" else np.float32
        self._specs["actions"] = (self.shape_prefix + (num_actions(env_info.action_space),), np.dtype(a_dt))
        self._specs["rewards"] = (self.shape_prefix, np.dtype(np.float32))
        self._specs["terminated"] = (self.shape_prefix, np.dtype(np.bool_))
        self._specs["truncated"] = (self.shape_prefix, np.dtype(np.bool_))
        # multi-agent: inactive agents are masked out of training
        # (reference non_batched_sampling.py:82-84 is_active handling)
        self._specs["active"] = (self.shape_prefix, np.dtype(np.bool_))

        self._prefix = name_prefix or f"sftpu_{os.getpid()}_{int(time.time() * 1e6) % 10**9}"
        self._shms: Dict[str, shared_memory.SharedMemory] = {}
        self.arrays: Dict[str, np.ndarray] = {}
        for name, (shape, dtype) in self._specs.items():
            nbytes = int(np.prod(shape)) * dtype.itemsize
            shm_name = f"{self._prefix}_{name}"
            if create:
                shm = shared_memory.SharedMemory(name=shm_name, create=True, size=max(1, nbytes))
            else:
                shm = shared_memory.SharedMemory(name=shm_name, create=False)
            self._shms[name] = shm
            self.arrays[name] = np.ndarray(shape, dtype=dtype, buffer=shm.buf)
            if create:
                self.arrays[name].fill(0)

    def attach_spec(self):
        return {"prefix": self._prefix, "specs": self._specs}

    @classmethod
    def attach(cls, cfg, env_info, spec):
        obj = cls.__new__(cls)
        obj.cfg = cfg
        obj._prefix = spec["prefix"]
        obj._specs = spec["specs"]
        obj._shms = {}
        obj.arrays = {}
        for name, (shape, dtype) in obj._specs.items():
            shm = shared_memory.SharedMemory(name=f"{obj._prefix}_{name}", create=False)
            obj._shms[name] = shm
            obj.arrays[name] = np.ndarray(shape, dtype=dtype, buffer=shm.buf)
        return obj

    def close(self, unlink: bool = False):
        for shm in self._shms.values():
            try:
                shm.close()
                if unlink:
                    shm.unlink()
            except Exception:  # noqa: BLE001
                pass


# ------------------------------------------------------------------- worker


def _convert_host_action(space, a: np.ndarray):
    """Flat action vector -> what the gymnasium env expects (int for Discrete,
    array for Box, tuple of components for Tuple — reference
    batched_sampling.py preprocess_actions)."""
    import gymnasium as gym

    if isinstance(space, gym.spaces.Discrete):
        return int(a[0]) if getattr(a, "ndim", 0) else int(a)
    if isinstance(space, gym.spaces.Box):
        return np.asarray(a, dtype=space.dtype).reshape(space.shape)
    if isinstance(space, gym.spaces.Tuple):
        parts, off = [], 0
        for sub in space.spaces:
            n = 1 if isinstance(sub, gym.spaces.Discrete) else int(np.prod(sub.shape))
            parts.append(_convert_host_action(sub, a[off : off + n]))
            off += n
        return tuple(parts)
    # fallback: squeeze single-component int actions, pass arrays through
    if a.shape and a.shape[0] == 1 and np.issubdtype(a.dtype, np.integer):
        return int(a[0])
    return a


class EnvSlotStepper:
    """Owns one worker's envs and maps them onto agent-slots in the slabs.

    Single-agent envs occupy one slot each; multi-agent envs (reference
    convention: env.num_agents > 1, step(list) -> lists, infos carry
    'is_active') occupy num_agents consecutive slots. Inactive agents are
    recorded in the 'active' slab so the learner masks them
    (reference non_batched_sampling.py:82-84,197-203).

    Batched vector envs (is_batched_vector_env=True: one object stepping a
    whole batch as arrays — the reference's BatchedVecEnv contract,
    batched_sampling.py:298-392, and the envpool backend) get ONE instance
    per split sized to the split (env_config.num_envs) and are stepped with
    a single array call, no per-env Python loop. The contract is auto-reset:
    obs returned for done envs is the next episode's first observation.
    """

    def __init__(self, cfg, env_info, slabs: "ShmSlabs", worker_idx: int):
        self.cfg = cfg
        self.env_info = env_info
        self.slabs = slabs
        self.w = worker_idx
        # multihost: every process must sample DIFFERENT episodes (model seeds
        # stay identical across hosts — only env seeding decorrelates)
        self.seed = (cfg.seed or 0) + getattr(cfg, "env_seed_offset", 0)
        self.K = cfg.worker_num_splits
        self.A = env_info.num_agents
        self.E = cfg.num_envs_per_worker // self.K  # envs per split
        self.multiagent = self.A > 1
        self.batched = False  # set by create_envs when the factory returns a batched vector env
        self._squeeze_actions = False
        self.envs: List[List[Any]] = []
        slots = self.E * self.A
        # processed (scaled/clipped, what the learner sees) and raw returns are
        # tracked separately (reference batched_sampling.py episodic stats keep
        # both; device sampler: sampling.py ep_return vs ep_return_raw)
        self.ep_returns = np.zeros((self.K, slots), np.float64)
        self.ep_raw_returns = np.zeros((self.K, slots), np.float64)
        self.ep_lens = np.zeros((self.K, slots), np.int64)
        self._r_scale = float(cfg.reward_scale)
        self._r_clip = float(cfg.reward_clip)
        self.obs_keys = [k for k in slabs.arrays if k.startswith("obs_")]

    def _proc_reward(self, r: float) -> float:
        return float(np.clip(r * self._r_scale, -self._r_clip, self._r_clip))

    def create_envs(self) -> None:
        from sample_factory_tpu.envs.env_utils import create_env
        from sample_factory_tpu.envs.gym_wrappers import wrap_host_env

        for s in range(self.K):
            row = []
            for e in range(self.E):
                env_id = self.w * self.cfg.num_envs_per_worker + s * self.E + e
                # num_envs tells batched factories (envpool etc.) the split
                # size; per-env factories ignore it
                env_config = AttrDict(
                    worker_index=self.w, vector_index=s * self.E + e, env_id=env_id, num_envs=self.E
                )
                env = create_env(self.cfg.env, cfg=self.cfg, env_config=env_config)
                if getattr(env, "is_batched_vector_env", False):
                    assert e == 0, "batched vector env must be the only env of its split"
                    assert not self.multiagent, "batched + multi-agent host envs not supported"
                    n = getattr(env, "num_envs", None)
                    assert n == self.E, f"batched env has num_envs={n}, expected {self.E} (num_envs_per_worker/worker_num_splits)"
                    self.batched = True
                    from sample_factory_tpu.envs.spaces import Discrete

                    self._squeeze_actions = isinstance(self.env_info.action_space, Discrete)
                    row.append(env)
                    break
                if not getattr(env, "is_multiagent", False):
                    env = wrap_host_env(env, self.cfg)
                row.append(env)
            self.envs.append(row)

    def _write_obs(self, s: int, slot: int, obs: Dict[str, np.ndarray]) -> None:
        for k in self.obs_keys:
            self.slabs.arrays[k][self.w, s, slot] = obs[k[4:]]

    def _wrap_ma_obs(self, obs):
        # multi-agent envs return raw per-agent obs (dict or array)
        return obs if isinstance(obs, dict) else {"obs": obs}

    def _write_obs_batch(self, s: int, obs_batch) -> None:
        ob = obs_batch if isinstance(obs_batch, dict) else {"obs": obs_batch}
        for k in self.obs_keys:
            self.slabs.arrays[k][self.w, s, :] = ob[k[4:]]

    def reset_all(self) -> None:
        if self.batched:
            self.slabs.arrays["active"][self.w] = True
            for s in range(self.K):
                obs, _ = self.envs[s][0].reset(seed=self.seed + self.w * 10007 + s * 101)
                self._write_obs_batch(s, obs)
            return
        self.slabs.arrays["active"][self.w] = True
        rng = np.random.default_rng(self.seed + self.w)
        total_envs = self.K * self.E
        for s in range(self.K):
            for e in range(self.E):
                seed = self.seed + self.w * 10007 + s * 101 + e
                if self.multiagent:
                    obs_list, _ = self.envs[s][e].reset(seed=seed)
                    for a in range(self.A):
                        self._write_obs(s, e * self.A + a, self._wrap_ma_obs(obs_list[a]))
                else:
                    obs, _ = self.envs[s][e].reset(seed=seed)
                    # stagger episode phases so resets don't synchronize across
                    # the vector (reference --decorrelate_envs_on_one_worker)
                    if self.cfg.decorrelate_envs_on_one_worker and not self.cfg.benchmark:
                        env = self.envs[s][e]
                        warmup = int(rng.integers(0, max(1, self.cfg.rollout * (s * self.E + e + 1) // total_envs + 1)))
                        for _ in range(warmup):
                            obs2, _, term, trunc, _ = env.step(env.action_space.sample())
                            if term or trunc:
                                obs2, _ = env.reset()
                            obs = obs2
                    self._write_obs(s, e, obs)

    def step_split(self, split: int) -> List[Tuple[float, int, Optional[Dict[str, Any]]]]:
        """Step all envs of a split using the actions slab; returns completed
        episodes as (return, length, episode_extra_stats-or-None) tuples.

        `episode_extra_stats` is the reference's per-episode custom-summaries
        channel (env info dict key, e.g. DMLab raw scores in
        sf_examples/dmlab/wrappers/reward_shaping.py:32-38); it rides the
        completed-episode message back to the runner's stats handlers."""
        if self.batched:
            return self._step_split_batched(split)
        arrays = self.slabs.arrays
        actions = arrays["actions"][self.w, split]
        completed: List[Tuple[float, int, Optional[Dict[str, Any]]]] = []
        for e in range(self.E):
            env = self.envs[split][e]
            if self.multiagent:
                space = self.envs[split][e].action_space
                acts = [_convert_host_action(space, actions[e * self.A + a]) for a in range(self.A)]
                obs_list, rewards, terms, truncs, infos = env.step(acts)
                all_done = all(bool(t) or bool(tr) for t, tr in zip(terms, truncs))
                for a in range(self.A):
                    slot = e * self.A + a
                    self.ep_returns[split, slot] += self._proc_reward(rewards[a])
                    self.ep_raw_returns[split, slot] += rewards[a]
                    self.ep_lens[split, slot] += 1
                    arrays["rewards"][self.w, split, slot] = rewards[a]
                    arrays["terminated"][self.w, split, slot] = terms[a]
                    arrays["truncated"][self.w, split, slot] = truncs[a]
                    arrays["active"][self.w, split, slot] = infos[a].get("is_active", True)
                if all_done:
                    for a in range(self.A):
                        slot = e * self.A + a
                        extras = infos[a].get("episode_extra_stats") if isinstance(infos[a], dict) else None
                        completed.append(
                            (
                                float(self.ep_returns[split, slot]),
                                float(self.ep_raw_returns[split, slot]),
                                int(self.ep_lens[split, slot]),
                                extras,
                            )
                        )
                        self.ep_returns[split, slot] = 0.0
                        self.ep_raw_returns[split, slot] = 0.0
                        self.ep_lens[split, slot] = 0
                    obs_list, _ = env.reset()
                for a in range(self.A):
                    self._write_obs(split, e * self.A + a, self._wrap_ma_obs(obs_list[a]))
            else:
                a = _convert_host_action(env.action_space, actions[e])
                obs, reward, terminated, truncated, info = env.step(a)
                self.ep_returns[split, e] += self._proc_reward(reward)
                self.ep_raw_returns[split, e] += reward
                self.ep_lens[split, e] += 1
                if terminated or truncated:
                    extras = info.get("episode_extra_stats") if isinstance(info, dict) else None
                    completed.append(
                        (
                            float(self.ep_returns[split, e]),
                            float(self.ep_raw_returns[split, e]),
                            int(self.ep_lens[split, e]),
                            extras,
                        )
                    )
                    self.ep_returns[split, e] = 0.0
                    self.ep_raw_returns[split, e] = 0.0
                    self.ep_lens[split, e] = 0
                    obs, _ = env.reset()
                arrays["rewards"][self.w, split, e] = reward
                arrays["terminated"][self.w, split, e] = terminated
                arrays["truncated"][self.w, split, e] = truncated
                self._write_obs(split, e, obs)
        return completed

    def _step_split_batched(self, split: int):
        """One array-call step of the whole split (reference
        batched_sampling.py:298-392): actions out of the slab, obs/rewards/
        dones written back as batches, episodic stats maintained vectorized."""
        arrays = self.slabs.arrays
        env = self.envs[split][0]
        acts = arrays["actions"][self.w, split]
        a = acts[:, 0] if self._squeeze_actions else acts
        obs, rew, term, trunc, infos = env.step(a)
        rew = np.asarray(rew, np.float32)
        term = np.asarray(term, bool)
        trunc = np.asarray(trunc, bool)
        arrays["rewards"][self.w, split] = rew
        arrays["terminated"][self.w, split] = term
        arrays["truncated"][self.w, split] = trunc

        proc = np.clip(rew * self._r_scale, -self._r_clip, self._r_clip)
        self.ep_returns[split] += proc
        self.ep_raw_returns[split] += rew
        self.ep_lens[split] += 1
        done = term | trunc
        completed: List[Tuple[float, float, int, Optional[Dict[str, Any]]]] = []
        if done.any():
            extras_list = infos.get("episode_extra_stats") if isinstance(infos, dict) else None
            for i in np.nonzero(done)[0]:
                extras = None
                if extras_list is not None:
                    cand = extras_list[i]
                    extras = cand if isinstance(cand, dict) and cand else None
                completed.append(
                    (
                        float(self.ep_returns[split, i]),
                        float(self.ep_raw_returns[split, i]),
                        int(self.ep_lens[split, i]),
                        extras,
                    )
                )
            self.ep_returns[split, done] = 0.0
            self.ep_raw_returns[split, done] = 0.0
            self.ep_lens[split, done] = 0
        self._write_obs_batch(split, obs)
        return completed

    def set_reward_shaping(self, shaping: Dict[str, Any], slot_mask: Optional[np.ndarray] = None) -> None:
        """Apply new reward shaping to envs. slot_mask [K, E*A] selects which
        agent slots (i.e. which policy's agents) it applies to; None = all.
        Batched vector envs get one whole-split call (per-slot granularity is
        a per-env-object feature)."""
        if self.batched:
            for s in range(self.K):
                env = self.envs[s][0]
                if hasattr(env, "set_reward_shaping") and (slot_mask is None or slot_mask[s].any()):
                    if slot_mask is not None and not slot_mask[s].all():
                        # a batched pool applies shaping to the whole split —
                        # with multi-policy PBT one policy's shaping would leak
                        # to another policy's envs; surface it loudly
                        log.warning(
                            "set_reward_shaping on a batched vector env covers the whole split "
                            "but slot_mask selects only %d/%d slots (split %d): shaping leaks to "
                            "other policies' envs. Use per-env (non-batched) envs for "
                            "multi-policy reward-shaping PBT.",
                            int(slot_mask[s].sum()),
                            slot_mask[s].size,
                            s,
                        )
                    try:
                        env.set_reward_shaping(shaping, 0)
                    except Exception as exc:  # noqa: BLE001
                        log.warning("set_reward_shaping failed on batched env (split %d): %s", s, exc)
            return
        for s in range(self.K):
            for e in range(self.E):
                env = self.envs[s][e]
                if not hasattr(env, "set_reward_shaping"):
                    continue
                for a in range(self.A):
                    slot = e * self.A + a
                    if slot_mask is None or slot_mask[s, slot]:
                        try:
                            env.set_reward_shaping(shaping, a)
                        except Exception as exc:  # noqa: BLE001 - env may not support per-agent
                            log.debug("set_reward_shaping failed (split %d env %d agent %d): %s", s, e, a, exc)

    def close(self) -> None:
        for row in self.envs:
            for env in row:
                try:
                    env.close()
                except Exception:  # noqa: BLE001
                    pass


def _apply_cpu_affinity(cfg, worker_idx: int) -> None:
    """Pin the worker to a core range (reference utils.py:471-500)."""
    if not cfg.set_workers_cpu_affinity:
        return
    try:
        cores = os.sched_getaffinity(0)
        num_cores = len(cores)
        core_list = sorted(cores)
        core = core_list[worker_idx % num_cores]
        os.sched_setaffinity(0, {core})
    except Exception:  # noqa: BLE001 - affinity is best-effort
        pass


def host_env_worker(worker_idx: int, cfg, env_info, slabs_spec, cmd_conn, res_conn, register_fn_pickled):
    """Worker process: owns num_envs_per_worker gymnasium envs split into
    worker_num_splits groups; steps a group per command.

    cmd_conn/res_conn are either mp.Pipe connections or ShmQueue instances
    (the native faster-fifo-equivalent channel) — both expose recv/send via
    the small adapters below.
    """
    recv_cmd = (lambda: cmd_conn.get(timeout=3600.0)) if hasattr(cmd_conn, "get") else cmd_conn.recv
    send_res = (
        (lambda msg: res_conn.put((worker_idx, msg))) if hasattr(res_conn, "put") else (lambda msg: res_conn.send(msg))
    )
    try:
        _apply_cpu_affinity(cfg, worker_idx)
        if cfg.force_envs_single_thread:
            os.environ.setdefault("OMP_NUM_THREADS", "1")
            os.environ.setdefault("MKL_NUM_THREADS", "1")

        # re-register envs in this process (the registry is per-process state)
        if register_fn_pickled is not None:
            register_fn = pickle.loads(register_fn_pickled)
            register_fn()

        slabs = ShmSlabs.attach(cfg, env_info, slabs_spec)
        stepper = EnvSlotStepper(cfg, env_info, slabs, worker_idx)
        stepper.create_envs()
        stepper.reset_all()
        send_res(("initialized", None, None))

        while True:
            msg = recv_cmd()
            if msg[0] == "step":
                split = msg[1]
                completed = stepper.step_split(split)
                send_res(("ready", split, completed))
            elif msg[0] == "set_reward_shaping":
                # PBT-mutated reward shaping for envs whose agents belong to a
                # policy (reference runner.py:425-451 update_training_info)
                stepper.set_reward_shaping(msg[1], msg[2])
            elif msg[0] == "close":
                break
        stepper.close()
        slabs.close()
        send_res(("closed", None, None))
    except KeyboardInterrupt:
        pass
    except Exception as e:  # noqa: BLE001
        import traceback

        send_res(("error", None, f"{e}\n{traceback.format_exc()}"))


# -------------------------------------------------------------- host sampler


class HostVectorSampler:
    """Steps W workers x K splits x E envs and produces device trajectories.

    In --serial_mode the envs are stepped inline (no processes), the debugging
    fallback the reference also provides (docs/07-advanced-topics/serial-mode.md).
    """

    def __init__(self, cfg, env_info, model, register_fn=None):
        self.cfg = cfg
        self.env_info = env_info
        self.model = model
        self.register_fn = register_fn

        self.W = cfg.num_workers
        self.K = cfg.worker_num_splits
        assert cfg.num_envs_per_worker % self.K == 0, "num_envs_per_worker must divide by worker_num_splits"
        self.A = env_info.num_agents
        self.E = (cfg.num_envs_per_worker // self.K) * self.A  # agent-slots per worker-split
        self.num_envs = self.W * self.K * self.E  # total agent-slots (transitions per step)
        self.split_size = self.W * self.E  # slots per split across all workers

        self.slabs = ShmSlabs(cfg, env_info, create=True)
        self.workers: List[mp.Process] = []
        self.cmd_conns: List[Any] = []
        self.res_conns: List[Any] = []
        self.serial_envs = None
        self._serial_ep_stats = None
        self._use_shm_queue = False
        self.result_queue = None
        self.last_heartbeat = np.full(self.W, time.time())

        # device-side per-split policy state
        self.rnn_states = [initial_actor_critic_state(cfg, self.split_size) for _ in range(self.K)]

        self._policy_step = self._build_policy_step()
        self._policy_step_multi = self._build_policy_step_multi()
        self.episodic: List[Tuple[float, int]] = []  # (processed_return, length)
        self._raw_return_sum = 0.0  # pre-scale/clip returns of completed episodes
        self.episodic_extras: List[Dict[str, Any]] = []  # episode_extra_stats dicts

    # ------------------------------------------------------------- lifecycle

    def start(self) -> None:
        if self.cfg.serial_mode:
            self._start_serial()
            return
        ctx = mp.get_context("spawn")
        register_fn_pickled = pickle.dumps(self.register_fn) if self.register_fn is not None else None

        # prefer the native shm queue (batched get_many drains all worker
        # ready-signals under one lock, like the reference's faster-fifo)
        from sample_factory_tpu.native.shm_queue import ShmQueue

        self._use_shm_queue = ShmQueue.available()
        if self._use_shm_queue:
            self.result_queue = ShmQueue(capacity_bytes=4 << 20)
            self._pending_ready: Dict[int, int] = {}
        else:
            self.result_queue = None

        for w in range(self.W):
            if self._use_shm_queue:
                cmd_q = ShmQueue(capacity_bytes=1 << 20)
                child_cmd, child_res = cmd_q, self.result_queue
                self.cmd_conns.append(cmd_q)
                self.res_conns.append(None)
            else:
                parent_cmd, child_cmd = ctx.Pipe()
                parent_res, child_res = ctx.Pipe()
                self.cmd_conns.append(parent_cmd)
                self.res_conns.append(parent_res)
            p = ctx.Process(
                target=host_env_worker,
                args=(w, self.cfg, self.env_info, self.slabs.attach_spec(), child_cmd, child_res, register_fn_pickled),
                daemon=True,
            )
            p.start()
            self.workers.append(p)

        initialized = 0
        deadline = time.time() + 300
        while initialized < self.W:
            for w, msg in self._recv_results(timeout=max(1.0, deadline - time.time())):
                if msg[0] == "error":
                    raise RuntimeError(f"worker {w} failed to init: {msg[2]}")
                assert msg[0] == "initialized"
                initialized += 1
            if time.time() > deadline:
                raise TimeoutError("host env workers did not initialize in time")
        log.info(
            "HostVectorSampler: %d workers x %d splits x %d envs started (transport=%s)",
            self.W,
            self.K,
            self.E,
            "shm_queue" if self._use_shm_queue else "pipes",
        )

    def _recv_results(self, timeout: float) -> List[Tuple[int, tuple]]:
        """Drain available (worker, msg) results from all workers."""
        out: List[Tuple[int, tuple]] = []
        if self._use_shm_queue:
            from sample_factory_tpu.native.shm_queue import QueueEmpty

            try:
                out.extend(self.result_queue.get_many(timeout=timeout))
            except QueueEmpty:
                pass
            return out
        deadline = time.time() + timeout
        for w in range(self.W):
            while self.res_conns[w].poll(0):
                out.append((w, self.res_conns[w].recv()))
        if not out:
            # block on the first conn that becomes readable
            for w in range(self.W):
                if self.res_conns[w].poll(max(0.0, deadline - time.time())):
                    out.append((w, self.res_conns[w].recv()))
                    break
        return out

    def _start_serial(self) -> None:
        self.serial_steppers = []
        for w in range(self.W):
            stepper = EnvSlotStepper(self.cfg, self.env_info, self.slabs, w)
            stepper.create_envs()
            stepper.reset_all()
            self.serial_steppers.append(stepper)
        self.serial_envs = True  # marker: serial mode active

    def close(self) -> None:
        if self.serial_envs is not None:
            for stepper in self.serial_steppers:
                stepper.close()
        else:
            for conn in self.cmd_conns:
                try:
                    if self._use_shm_queue:
                        conn.put(("close",))
                    else:
                        conn.send(("close",))
                except Exception:  # noqa: BLE001
                    pass
            for p in self.workers:
                p.join(timeout=5)
                if p.is_alive():
                    p.terminate()
            if self._use_shm_queue:
                for q in self.cmd_conns:
                    q.close()
                if self.result_queue is not None:
                    self.result_queue.close()
        self.slabs.close(unlink=True)

    # ------------------------------------------------------------- stepping

    def _policy_step_fn(self):
        cfg, env_info, model = self.cfg, self.env_info, self.model
        a_dtype = jnp.int32 if action_dtype(env_info.action_space) == "int32" else jnp.float32

        def policy_step(params, obs_rms, obs, rnn_state, key):
            normalized = obs_rms_normalize(obs_rms, _static_preprocess(cfg, obs)) if obs_rms is not None else _static_preprocess(cfg, obs)
            action_params, values, new_rnn = model.apply(params, normalized, rnn_state)
            dist = get_action_distribution(env_info.action_space, action_params, obs.get("action_mask"))
            actions, log_probs = sample_actions_log_probs(dist, key)
            return actions.astype(a_dtype), log_probs, action_params, values, new_rnn

        return policy_step

    def _build_policy_step(self):
        single = self._policy_step_fn()

        def step(params, obs_rms, obs, rnn_state, done, key):
            # episode-boundary RNN reset fused into the inference program: one
            # dispatch per split instead of a separate where + small-op chain
            # (the hot loop's per-slot host overhead, profiled r5)
            rnn_in = jnp.where(done[:, None] > 0, jnp.zeros_like(rnn_state), rnn_state)
            out = single(params, obs_rms, obs, rnn_in, key)
            return out + (rnn_in,)

        return jax.jit(step)

    def _split_obs(self, split: int) -> Dict[str, np.ndarray]:
        out = {}
        for k, arr in self.slabs.arrays.items():
            if k.startswith("obs_"):
                out[k[4:]] = arr[:, split].reshape((self.split_size,) + arr.shape[3:])
        return out

    def _signal_step(self, split: int) -> None:
        if self.serial_envs is not None:
            self._serial_step(split)
        elif self._use_shm_queue:
            for q in self.cmd_conns:
                q.put(("step", split))
        else:
            for conn in self.cmd_conns:
                conn.send(("step", split))

    def _wait_ready(self, split: int) -> None:
        if self.serial_envs is not None:
            return
        if not hasattr(self, "_ready_counts"):
            self._ready_counts: Dict[int, int] = {}
        deadline = time.time() + max(10.0, self.cfg.heartbeat_reporting_interval)
        while self._ready_counts.get(split, 0) < self.W:
            remaining = deadline - time.time()
            if remaining <= 0:
                raise TimeoutError(f"workers did not respond for split {split} (heartbeat timeout)")
            for w, msg in self._recv_results(timeout=min(remaining, 5.0)):
                if msg[0] == "error":
                    raise RuntimeError(f"worker {w} crashed: {msg[2]}")
                if msg[0] != "ready":
                    continue
                self._ready_counts[msg[1]] = self._ready_counts.get(msg[1], 0) + 1
                self.last_heartbeat[w] = time.time()
                self._record_completed(msg[2])
        self._ready_counts[split] -= self.W

    def _record_completed(self, completed) -> None:
        for r, raw_r, length, extras in completed:
            self.episodic.append((r, length))
            self._raw_return_sum += raw_r
            if extras:
                self.episodic_extras.append(extras)

    def _serial_step(self, split: int) -> None:
        for stepper in self.serial_steppers:
            self._record_completed(stepper.step_split(split))

    def set_reward_shaping(self, shaping: Dict[str, Any], slot_mask=None) -> None:
        """Push PBT-mutated reward shaping to the envs. slot_mask
        [K, split_size] (slots are worker-major) selects affected agents."""
        per_worker = self.E  # slots per worker-split
        if self.serial_envs is not None:
            for w, stepper in enumerate(self.serial_steppers):
                mask_w = None if slot_mask is None else slot_mask[:, w * per_worker : (w + 1) * per_worker]
                stepper.set_reward_shaping(shaping, mask_w)
            return
        for w, conn in enumerate(self.cmd_conns):
            mask_w = None if slot_mask is None else slot_mask[:, w * per_worker : (w + 1) * per_worker]
            msg = ("set_reward_shaping", shaping, mask_w)
            if self._use_shm_queue:
                conn.put(msg)
            else:
                conn.send(msg)

    # ------------------------------------------------------ rollout assembly

    def collect_rollout(
        self, params, obs_rms, key, policy_version, policy_id: int = 0, slot_policies=None, idle_fn=None
    ):
        """Collect cfg.rollout steps from all envs. Returns (trajectory, stats).

        Per timestep, splits are processed round-robin: while split s's envs
        step on CPU workers, the device runs inference for split s+1.

        idle_fn, if given, is called once per (timestep, split) right after
        that split's actions are shipped to the workers — a device-idle slot
        the runner uses to dispatch one learner quantum (QuantizedTrainer),
        so training overlaps env stepping on a single chip.

        Multi-policy self-play: pass STACKED params/obs_rms (leading policy
        axis), slot_policies [K, split_size] (agent->policy mapping, reference
        agent_policy_mapping.py) and policy_version as an array [P].
        """
        cfg = self.cfg
        T = cfg.rollout
        transitions: List[List[Dict[str, Any]]] = [[] for _ in range(self.K)]
        self.episodic = []
        self._raw_return_sum = 0.0
        self.episodic_extras = []
        N = self.num_envs
        # host-side scalar streams live in preallocated numpy buffers, laid
        # out [T, N] (env axis = split-major, matching _assemble's concat
        # order) — uploaded as FOUR arrays at assemble time instead of
        # 4 x T x K tiny transfers (profiled r5: per-slot small-op dispatch
        # was a visible slice of the ~700 steps/s pipeline)
        self._host_buf = {k: np.zeros((T, N), np.float32) for k in ("rewards", "dones", "time_outs", "active")}
        # one batch of per-slot RNG keys per rollout (replaces a traced
        # fold_in dispatch per (t, split))
        slot_keys = np.asarray(jax.random.split(key, T * self.K))

        for t in range(T):
            for s in range(self.K):
                self._collect_one(params, obs_rms, slot_keys[t * self.K + s], t, s, transitions, slot_policies)
                if idle_fn is not None:
                    idle_fn()

        # flush: wait for the last env steps, finalize rewards/dones
        final_obs = []
        for s in range(self.K):
            self._wait_ready(s)
            done = self._finalize_last(s, T - 1)
            self.rnn_states[s] = jnp.where(jnp.asarray(done)[:, None] > 0, jnp.zeros_like(self.rnn_states[s]), self.rnn_states[s])
            final_obs.append({k: jnp.asarray(v) for k, v in self._split_obs(s).items()})

        traj = self._assemble(transitions, final_obs, policy_version, policy_id, slot_policies)
        stats = {
            "count": float(len(self.episodic)),
            "return_sum": float(sum(r for r, _ in self.episodic)),
            "raw_return_sum": float(self._raw_return_sum),
            "len_sum": float(sum(l for _, l in self.episodic)),
            "extra_stats": list(self.episodic_extras),
        }
        return traj, stats

    def _collect_one(self, params, obs_rms, slot_key, t, s, transitions, slot_policies=None):
        if t > 0:
            # finalize previous step's transition for this split
            self._wait_ready(s)
            done = self._finalize_last(s, t - 1)
        else:
            done = self._zero_done

        obs_np = self._split_obs(s)
        obs_dev = {k: jnp.asarray(v) for k, v in obs_np.items()}
        rnn = self.rnn_states[s]
        if slot_policies is None:
            actions, log_probs, action_params, values, new_rnn, rnn_in = self._policy_step(
                params, obs_rms, obs_dev, rnn, done, slot_key
            )
        else:
            actions, log_probs, action_params, values, new_rnn, rnn_in = self._policy_step_multi(
                params, obs_rms, obs_dev, rnn, done, jnp.asarray(slot_policies[s]), slot_key
            )
        self.rnn_states[s] = new_rnn

        # ship actions to workers and let them step while we do other splits
        a_np = np.asarray(actions)
        self.slabs.arrays["actions"][:, s] = a_np.reshape((self.W, self.E) + a_np.shape[1:])
        self._signal_step(s)

        transitions[s].append(
            {
                "obs": obs_dev,
                "rnn_states": rnn_in,  # the post-reset state inference consumed
                "actions": actions,
                "action_logits": action_params,
                "log_prob_actions": log_probs,
                "values": values,
            }
        )

    @property
    def _zero_done(self) -> np.ndarray:
        z = getattr(self, "_zero_done_arr", None)
        if z is None:
            z = self._zero_done_arr = np.zeros(self.split_size, np.float32)
        return z

    def _finalize_last(self, s: int, t: int) -> np.ndarray:
        """Read the step-t results for split s from the slabs into the host
        buffers. Returns the done mask (float32 [split_size])."""
        rew = self.slabs.arrays["rewards"][:, s].reshape(self.split_size)
        term = self.slabs.arrays["terminated"][:, s].reshape(self.split_size)
        trunc = self.slabs.arrays["truncated"][:, s].reshape(self.split_size)
        active = self.slabs.arrays["active"][:, s].reshape(self.split_size)
        done = np.logical_or(term, trunc).astype(np.float32)
        lo, hi = s * self.split_size, (s + 1) * self.split_size
        buf = self._host_buf
        buf["rewards"][t, lo:hi] = _process_rewards_np(self.cfg, rew.astype(np.float32))
        buf["dones"][t, lo:hi] = done
        buf["time_outs"][t, lo:hi] = np.logical_and(trunc, ~term)
        buf["active"][t, lo:hi] = active
        return done

    def _build_policy_step_multi(self):
        """P-way forward + per-slot selection for mixed-policy sampling.

        The reference routes each agent's obs to its policy's inference worker
        (non_batched_sampling.py); with a stacked population we compute all P
        forwards (P is small) and select per slot — one fused program, no
        routing or gathers of parameter trees.
        """
        single = self._policy_step_fn()

        def policy_step_multi(stacked_params, stacked_obs_rms, obs, rnn_state, done, slot_policies, key):
            rnn_in = jnp.where(done[:, None] > 0, jnp.zeros_like(rnn_state), rnn_state)
            P = jax.tree.leaves(stacked_params)[0].shape[0]
            keys = jax.random.split(key, P)
            outs = jax.vmap(lambda p, o, k: single(p, o, obs, rnn_in, k))(stacked_params, stacked_obs_rms, keys)

            n = slot_policies.shape[0]
            idx = jnp.arange(n)

            def select(x):  # x: [P, N, ...] -> [N, ...]
                return x[slot_policies, idx]

            return jax.tree.map(select, outs) + (rnn_in,)

        return jax.jit(policy_step_multi)

    def _assemble(self, transitions, final_obs, policy_version, policy_id, slot_policies=None):
        """Stack [T] x K splits -> trajectory [T, N] matching the device sampler
        schema — as ONE jitted program (the eager concat/stack loops were
        ~5000 small dispatches per rollout, a measurable slice of the host
        pipeline's cost; the jitted version is a single dispatch whose trace
        is cached across rollouts)."""
        T = self.cfg.rollout
        if not hasattr(self, "_assemble_jit"):

            def assemble(trans, fin_obs, fin_rnn, host_buf):
                def cat(parts):
                    return jnp.concatenate(parts, axis=0) if self.K > 1 else parts[0]

                def stack_key(key_fn):
                    return jnp.stack([cat([key_fn(trans[s][t]) for s in range(self.K)]) for t in range(T)], axis=0)

                traj = {}
                obs_keys = trans[0][0]["obs"].keys()
                final = {k: cat([fin_obs[s][k] for s in range(self.K)]) for k in obs_keys}
                traj["obs"] = {
                    k: jnp.concatenate([stack_key(lambda tr, kk=k: tr["obs"][kk]), final[k][None]], axis=0)
                    for k in obs_keys
                }
                rnn_stacked = stack_key(lambda tr: tr["rnn_states"])
                traj["rnn_states"] = jnp.concatenate([rnn_stacked, cat(list(fin_rnn))[None]], axis=0)
                for k in ("actions", "action_logits", "log_prob_actions", "values"):
                    traj[k] = stack_key(lambda tr, kk=k: tr[kk])
                for k in ("rewards", "dones", "time_outs"):
                    traj[k] = host_buf[k]
                traj["active"] = host_buf["active"] > 0
                return traj

            self._assemble_jit = jax.jit(assemble)

        trans = tuple(tuple(ts) for ts in transitions)
        traj = self._assemble_jit(trans, tuple(final_obs), tuple(self.rnn_states), self._host_buf)
        active = traj.pop("active")  # [T, N] bool
        shape = traj["rewards"].shape
        if slot_policies is None:
            pid = jnp.full(shape, policy_id, jnp.int32)
            version = jnp.full(shape, int(policy_version), jnp.int32)
        else:
            # per-slot policy assignment; versions indexed by the slot's policy
            slot_pol = jnp.concatenate([jnp.asarray(slot_policies[s]) for s in range(self.K)], axis=0)
            pid = jnp.broadcast_to(slot_pol[None, :], shape)
            versions = jnp.asarray(policy_version, jnp.int32)
            version = jnp.broadcast_to(versions[slot_pol][None, :], shape)
        # inactive agents -> policy_id -1, masked by the learner's valids
        # (reference non_batched_sampling.py is_active -> policy_id=-1)
        traj["policy_id"] = jnp.where(active, pid, -1)
        traj["policy_version"] = version
        return traj
