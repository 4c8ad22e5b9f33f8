"""Multi-host coordination utilities.

Replaces the reference's "distributed backend" gap (SURVEY.md §2.4: the
reference has no multi-node runtime — only whole-experiment SLURM
parallelism). Here multi-host runs share one training program: each host
drives its shard of envs, grads psum over ICI/DCN automatically, and these
helpers cover the host-side residue — stats aggregation, checkpoint gating,
and control broadcast.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def is_multihost() -> bool:
    return jax.process_count() > 1


def is_primary_host() -> bool:
    return jax.process_index() == 0


def aggregate_scalar_stats(stats: Dict[str, float], reduce: str = "mean") -> Dict[str, float]:
    """All-reduce host-side scalar stats (episode counts/returns, fps) across
    hosts. No-op on single-host runs."""
    if not is_multihost():
        return stats
    from jax.experimental import multihost_utils

    keys = sorted(stats.keys())
    local = np.asarray([float(stats[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(local)  # [num_hosts, K]
    if reduce == "mean":
        reduced = gathered.mean(axis=0)
    elif reduce == "sum":
        reduced = gathered.sum(axis=0)
    else:
        raise ValueError(reduce)
    return {k: float(v) for k, v in zip(keys, reduced)}


def broadcast_from_primary(tree: Any) -> Any:
    """Broadcast a pytree from host 0 to all hosts (PBT decisions, etc.)."""
    if not is_multihost():
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def sync_barrier(name: str = "barrier") -> None:
    if not is_multihost():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
