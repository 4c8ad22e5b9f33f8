"""Checkpointing: atomic msgpack snapshots with rotation, milestones, best.

Parity: reference `sample_factory/algo/learning/learner.py:300-386`
(checkpoint dict {train_step, env_steps, best_performance, model, optimizer,
curr_lr}; atomic temp-file+rename :349-351; rotation by --keep_checkpoints;
best-checkpoint gating; milestone dir). Normalizer state rides inside the
train state pytree, so it is checkpointed with the model exactly like the
reference (actor_critic.py:30-39).
"""

from __future__ import annotations

import glob
import os
import time
from os.path import basename, join
from typing import Any, Dict, List, Optional, Tuple

import jax
from flax import serialization

from sample_factory_tpu.utils.utils import checkpoint_dir, log


def checkpoint_name(train_step: int, env_steps: int) -> str:
    return f"checkpoint_{train_step:012d}_{env_steps}.msgpack"


def get_checkpoints(ckpt_dir: str, pattern: str = "checkpoint_*") -> List[str]:
    return sorted(glob.glob(join(ckpt_dir, pattern)))


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpts = get_checkpoints(ckpt_dir)
    return ckpts[-1] if ckpts else None


def best_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpts = get_checkpoints(ckpt_dir, pattern="best_*")
    return ckpts[-1] if ckpts else None


def save_checkpoint(
    cfg,
    policy_id: int,
    train_state,
    env_steps: int,
    best_performance: float,
    is_best: bool = False,
    milestone: bool = False,
) -> str:
    payload = {
        "train_state": jax.device_get(train_state),
        "env_steps": env_steps,
        "best_performance": best_performance,
        "train_step": int(jax.device_get(train_state.train_step)),
    }
    data = serialization.to_bytes(payload)

    d = checkpoint_dir(cfg, policy_id)
    if milestone:
        d = join(d, "milestones")
        os.makedirs(d, exist_ok=True)

    name = checkpoint_name(payload["train_step"], env_steps)
    if is_best:
        name = f"best_{name}"
    tmp = join(d, f".tmp_{name}")
    path = join(d, name)
    with open(tmp, "wb") as f:
        f.write(data)
    os.rename(tmp, path)  # atomic (reference :349-351)

    if not milestone:
        pattern = "best_*" if is_best else "checkpoint_*"
        keep = 1 if is_best else cfg.keep_checkpoints
        ckpts = get_checkpoints(d, pattern)
        for old in ckpts[:-keep] if keep > 0 else []:
            try:
                os.remove(old)
            except OSError:
                pass
    return path


def load_checkpoint(cfg, policy_id: int, train_state_template) -> Optional[Tuple[Any, int, float]]:
    """Returns (train_state, env_steps, best_performance) or None.

    Retries a few times against transient fs errors (reference :277-287).
    """
    d = checkpoint_dir(cfg, policy_id, mkdir=False)
    path = best_checkpoint(d) if cfg.load_checkpoint_kind == "best" else latest_checkpoint(d)
    if path is None and cfg.load_checkpoint_kind == "best":
        path = latest_checkpoint(d)
    if path is None:
        return None

    for attempt in range(3):
        try:
            with open(path, "rb") as f:
                data = f.read()
            template = {
                "train_state": jax.device_get(train_state_template),
                "env_steps": 0,
                "best_performance": -1e9,
                "train_step": 0,
            }
            payload = serialization.from_bytes(template, data)
            log.info("Loaded checkpoint %s (env_steps=%d)", basename(path), payload["env_steps"])
            return payload["train_state"], int(payload["env_steps"]), float(payload["best_performance"])
        except Exception as e:  # noqa: BLE001
            log.warning("Checkpoint load attempt %d failed: %s", attempt + 1, e)
            time.sleep(0.5)
    raise RuntimeError(f"Could not load checkpoint {path}")
