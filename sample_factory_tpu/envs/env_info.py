"""EnvInfo: static metadata extracted from one probe env instance.

Parity: reference `sample_factory/algo/utils/env_info.py:22-134`
(obtain_env_info_in_a_separate_process). The probe runs inline: on-device
envs are pure functions (nothing to pollute), and host gymnasium envs are
built again inside worker processes anyway, so main-process state pollution
only affects the probe itself. --use_env_info_cache skips the probe entirely
using an on-disk cache keyed by env name + cfg fingerprint.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

from sample_factory_tpu.envs.device_env import DeviceEnv
from sample_factory_tpu.envs.env_utils import create_env
from sample_factory_tpu.envs.spaces import obs_space_as_dict
from sample_factory_tpu.utils.utils import log


@dataclass
class EnvInfo:
    obs_space: Any
    action_space: Any
    num_agents: int
    is_device_env: bool
    frameskip: int = 1
    gpu_actions: bool = False
    gpu_observations: bool = True
    action_splits: Optional[list] = None
    all_discrete: Optional[bool] = None
    reward_shaping_scheme: Optional[Dict[str, float]] = None
    env_info_protocol_version: int = 1


def extract_env_info(env, cfg) -> EnvInfo:
    if isinstance(env, DeviceEnv):
        return EnvInfo(
            obs_space=obs_space_as_dict(env.obs_space),
            action_space=env.action_space,
            num_agents=env.num_agents,
            is_device_env=True,
            frameskip=getattr(env, "frameskip", 1) if cfg is None else cfg.env_frameskip,
            reward_shaping_scheme=dict(env.reward_shaping) if env.reward_shaping else None,
        )

    # host gymnasium env
    from sample_factory_tpu.envs.spaces import from_gym_space

    obs_space = obs_space_as_dict(from_gym_space(env.observation_space))
    action_space = from_gym_space(env.action_space)
    num_agents = getattr(env, "num_agents", 1)
    reward_shaping = None
    if hasattr(env, "get_default_reward_shaping"):
        try:
            reward_shaping = env.get_default_reward_shaping()
        except Exception:  # noqa: BLE001 - env may not implement the interface fully
            pass
    return EnvInfo(
        obs_space=obs_space,
        action_space=action_space,
        num_agents=num_agents,
        is_device_env=False,
        frameskip=cfg.env_frameskip if cfg is not None else 1,
        reward_shaping_scheme=reward_shaping,
    )


def _probe_worker(cfg, register_payload, conn) -> None:
    """Probe-process body: create one env, extract info, ship it back.

    Runs with the CPU jax backend pinned so a device-env probe can never
    contend for the TPU with the parent (the reference's reason to spawn —
    engine/GL init must not pollute the trainer process, env_info.py:95-134).
    """
    try:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        import pickle

        if register_payload is not None:
            kind, data = register_payload
            if kind == "call":
                pickle.loads(data)()
            else:  # ("register", pickled factory for cfg.env)
                from sample_factory_tpu.envs.env_utils import register_env

                register_env(cfg.env, pickle.loads(data))
        env = create_env(cfg.env, cfg=cfg, env_config=None)
        info = extract_env_info(env, cfg)
        if hasattr(env, "close"):
            try:
                env.close()
            except Exception:  # noqa: BLE001
                pass
        conn.send(("ok", info))
    except Exception as e:  # noqa: BLE001
        import traceback

        conn.send(("error", f"{e}\n{traceback.format_exc()}"))
    finally:
        conn.close()


def _probe_in_process(cfg, register_fn=None) -> Optional[EnvInfo]:
    """Spawn a throwaway process for the probe (reference
    obtain_env_info_in_a_separate_process). Returns None when the probe
    process fails for any reason (caller falls back to the inline probe)."""
    import multiprocessing as mp
    import pickle

    try:
        if register_fn is not None:
            register_payload = ("call", pickle.dumps(register_fn))
        else:
            # propagate the factory registered in THIS process so the child
            # can create the env (the registry is per-process state)
            from sample_factory_tpu.algo.context import global_env_registry

            entry = global_env_registry().get(cfg.env)
            register_payload = ("register", pickle.dumps(entry.make_env_func)) if entry is not None else None
        pickle.dumps(cfg)
    except Exception:  # noqa: BLE001 - unpicklable cfg/factory: probe inline
        return None

    ctx = mp.get_context("spawn")
    parent, child = ctx.Pipe()
    p = ctx.Process(target=_probe_worker, args=(cfg, register_payload, child), daemon=True)
    p.start()
    child.close()
    try:
        if not parent.poll(180.0):
            log.warning("env info probe process timed out; probing inline")
            return None
        status, payload = parent.recv()
    except (EOFError, OSError):
        log.warning("env info probe process died; probing inline")
        return None
    finally:
        p.join(timeout=5)
        if p.is_alive():
            p.terminate()
        parent.close()
    if status != "ok":
        log.warning("env info probe process failed (%s); probing inline", str(payload).splitlines()[0])
        return None
    return payload


def obtain_env_info(cfg, register_fn=None) -> EnvInfo:
    """Build one probe env, extract the info, close it.

    The probe runs in a spawned throwaway process (reference
    env_info.py:95-134) so engine/GL/env-library init can't pollute the
    trainer process; in --serial_mode (the in-process debug regime) it runs
    inline. With --use_env_info_cache the result is pickled per env name —
    useful for envs with slow startup.
    """
    import os
    import pickle

    cache_path = None
    if cfg is not None and getattr(cfg, "use_env_info_cache", False):
        import hashlib

        # EnvInfo depends on env-shaping cfg fields; key the cache by their
        # fingerprint so a different cfg never reuses stale shapes (the
        # reference guards the same hazard with check_env_info, env_info.py:74-92)
        fp_fields = ("env_frameskip", "env_framestack", "pixel_format", "env_gpu_observations", "num_policies")
        fingerprint = "|".join(f"{k}={cfg.get(k)}" for k in fp_fields if hasattr(cfg, "get"))
        digest = hashlib.sha1(fingerprint.encode()).hexdigest()[:12]
        cache_dir = os.path.join(os.path.expanduser("~"), ".sample_factory_tpu", "env_info")
        os.makedirs(cache_dir, exist_ok=True)
        cache_path = os.path.join(cache_dir, f"{cfg.env}_{digest}.pkl")
        if os.path.isfile(cache_path):
            try:
                with open(cache_path, "rb") as f:
                    info = pickle.load(f)
                if getattr(info, "env_info_protocol_version", 0) == EnvInfo.env_info_protocol_version:
                    log.debug("Loaded cached env info for %s", cfg.env)
                    return info
            except Exception:  # noqa: BLE001 - stale cache
                pass

    info = None
    if not getattr(cfg, "serial_mode", False):
        info = _probe_in_process(cfg, register_fn)
    if info is None:
        env = create_env(cfg.env, cfg=cfg, env_config=None)
        info = extract_env_info(env, cfg)
        if hasattr(env, "close"):
            try:
                env.close()
            except Exception:  # noqa: BLE001
                log.warning("Probe env close() failed")

    if cache_path is not None:
        try:
            with open(cache_path, "wb") as f:
                pickle.dump(info, f)
        except Exception:  # noqa: BLE001
            pass
    return info
