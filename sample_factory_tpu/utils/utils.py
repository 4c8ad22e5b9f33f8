"""Logging, experiment directory layout, misc helpers.

Parity: reference `sample_factory/utils/utils.py` (log at :26, experiment_dir
at :407, cfg_file/done-file layout :399-443). Re-designed: no psutil/CPU
affinity machinery — on TPU the hot path is a single jitted program per host,
so process pinning is irrelevant; host-side helpers stay minimal.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
from os.path import join
from pathlib import Path
from typing import Any, Dict, Optional

# ------------------------------------------------------------------ logging

log = logging.getLogger("sf_tpu")


def _init_logger() -> None:
    if log.handlers:
        return
    log.setLevel(logging.DEBUG)
    log.propagate = False
    ch = logging.StreamHandler()
    ch.setLevel(logging.DEBUG)
    fmt = logging.Formatter("[%(asctime)s][%(process)05d] %(levelname)s %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
    ch.setFormatter(fmt)
    log.addHandler(ch)


_init_logger()


def init_file_logger(cfg) -> None:
    """Mirror console logs into <experiment_dir>/sf_log.txt (reference utils.py:55-77)."""
    if not getattr(cfg, "log_to_file", True):
        return
    exp_dir = experiment_dir(cfg)
    fh = logging.FileHandler(join(exp_dir, "sf_log.txt"))
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(logging.Formatter("[%(asctime)s][%(process)05d] %(levelname)s %(message)s"))
    log.addHandler(fh)


_LOG_EVERY_N_COUNTERS: Dict[str, int] = {}


def log_every_n(n: int, level: int, msg: str, *args) -> None:
    """Log only every n-th occurrence of this callsite (reference utils.py:481-497)."""
    key = msg
    count = _LOG_EVERY_N_COUNTERS.get(key, 0)
    if count % n == 0:
        log.log(level, msg, *args)
    _LOG_EVERY_N_COUNTERS[key] = count + 1


# ------------------------------------------------------- experiment layout


def experiment_dir(cfg, mkdir: bool = True) -> str:
    """train_dir/<experiment>/ (reference utils.py:407-425)."""
    d = join(cfg.train_dir, cfg.experiment)
    if mkdir:
        os.makedirs(d, exist_ok=True)
    return d


def cfg_file(cfg) -> str:
    return join(experiment_dir(cfg), "config.json")


def summaries_dir(cfg, policy_id: Optional[int] = None, mkdir: bool = True) -> str:
    d = join(experiment_dir(cfg, mkdir=mkdir), ".summary")
    if policy_id is not None:
        d = join(d, str(policy_id))
    if mkdir:
        os.makedirs(d, exist_ok=True)
    return d


def checkpoint_dir(cfg, policy_id: int, mkdir: bool = True) -> str:
    """train_dir/<experiment>/checkpoint_p<id>/ (reference learner.py:323-334)."""
    d = join(experiment_dir(cfg, mkdir=mkdir), f"checkpoint_p{policy_id}")
    if mkdir:
        os.makedirs(d, exist_ok=True)
    return d


def done_filename(cfg) -> str:
    return join(experiment_dir(cfg), "done")


def save_cfg(cfg, path: Optional[str] = None) -> None:
    path = path or cfg_file(cfg)
    d = dict(vars(cfg)) if isinstance(cfg, argparse.Namespace) else dict(cfg)
    with open(path, "w") as f:
        json.dump(d, f, indent=2, sort_keys=True, default=str)


def load_cfg_dict(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def remove_if_exists(path: str) -> None:
    p = Path(path)
    if p.is_dir():
        shutil.rmtree(path, ignore_errors=True)
    elif p.exists():
        p.unlink(missing_ok=True)


# ------------------------------------------------------------------- misc


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if isinstance(v, str) and v.lower() in ("true", "1", "yes"):
        return True
    if isinstance(v, str) and v.lower() in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"Boolean value expected, got {v!r}")


def debug_log_every_n(n: int, msg: str, *args) -> None:
    log_every_n(n, logging.DEBUG, msg, *args)


def git_info() -> Dict[str, str]:
    """Best-effort git hash of the user's project (reference utils.py:444-478)."""
    import subprocess

    try:
        sha = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL, timeout=5
        ).decode().strip()
        return {"git_hash": sha}
    except Exception:
        return {}


def configure_jax_platform(cfg) -> None:
    """Apply --device before the first backend use (reference pins GPUs by
    rewriting CUDA_VISIBLE_DEVICES per process, utils/gpu_utils.py:62-90; the
    JAX equivalent is selecting the platform). Platform choice is frozen at
    backend initialization, so this must run before any jax.devices() /
    computation. 'tpu' and 'auto' keep the environment's default backend
    (TPU plugins may register under a vendor platform name)."""
    device = getattr(cfg, "device", "auto")
    import os

    if device in (None, "auto", "tpu"):
        # auto-detect on a CPU-only setup still needs the O2->O1 workaround
        # below; we can't probe for accelerators without initializing the
        # backend (which would freeze the platform choice), so apply it when
        # the environment already forces the cpu platform. CPU-only machines
        # with no JAX_PLATFORMS set should pass --device=cpu explicitly.
        if device in (None, "auto") and os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
            if "xla_backend_optimization_level" not in os.environ.get("XLA_FLAGS", ""):
                os.environ["XLA_FLAGS"] = (
                    os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=1"
                ).strip()
        return

    if device == "cpu" and "xla_backend_optimization_level" not in os.environ.get("XLA_FLAGS", ""):
        # XLA:CPU's O2 LLVM backend hits a pathological pass (minutes-long
        # compiles) on some fused gather+elementwise kernels, e.g. the ant
        # physics substep; O1 compiles the same graphs in seconds and CPU is
        # the debug path anyway. Must be set before backend initialization.
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=1"
        ).strip()

    import jax

    target = {"cpu": "cpu", "gpu": "cuda"}[device]
    try:
        jax.config.update("jax_platforms", target)
    except Exception as e:  # noqa: BLE001
        log.warning("Could not select platform %s: %s", target, e)
        return
    platform = jax.devices()[0].platform
    if platform != target and not (target == "cuda" and platform == "gpu"):
        log.warning(
            "--device=%s requested but the active platform is %s "
            "(backend was already initialized before run_rl?)",
            device,
            platform,
        )
