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


def aggregate_episode_sums(ep: Dict[str, Any]) -> Dict[str, Any]:
    """Sum numeric episode-rollout stats (count/return_sum/len_sum, scalar or
    per-policy arrays) across hosts so every host sees GLOBAL episode stats —
    the windowed averages, console reports and PBT objectives derived from
    them then agree on all hosts. Non-numeric entries (e.g. the
    `extra_stats` list of per-episode dicts) stay host-local.

    Must be called in lockstep (once per training iteration on every host) —
    guaranteed for the device-env runners, whose jitted iteration is one
    global SPMD program. No-op on single-host runs.
    """
    if not is_multihost():
        return ep
    from jax.experimental import multihost_utils

    num_keys = sorted(
        k for k, v in ep.items() if isinstance(v, (int, float, np.floating, np.integer, np.ndarray))
    )
    if not num_keys:
        return ep
    flat = np.concatenate([np.ravel(np.asarray(ep[k], np.float32)) for k in num_keys])
    summed = multihost_utils.process_allgather(flat).sum(axis=0)
    out = dict(ep)
    offset = 0
    for k in num_keys:
        arr = np.asarray(ep[k])
        n = arr.size
        piece = summed[offset : offset + n].reshape(arr.shape)
        out[k] = type(ep[k])(piece) if isinstance(ep[k], (int, float)) else piece.astype(arr.dtype, copy=False)
        offset += n
    return out


def broadcast_objectives(objectives: list) -> list:
    """Broadcast per-policy PBT objectives from host 0 (None-safe via NaN
    sentinel). Host 0's windowed stats decide; with the PBT RNG seeded
    identically everywhere, all hosts then make identical exploit/explore
    decisions (the reference runs PBT only on its single Runner process —
    multihost parity requires this agreement)."""
    if not is_multihost():
        return objectives
    arr = np.asarray([np.nan if o is None else float(o) for o in objectives], np.float32)
    arr = np.asarray(broadcast_from_primary(arr))
    return [None if np.isnan(v) else float(v) for v in arr]


def globalize_host_trajectory(traj: Any, mesh) -> Any:
    """Per-process host-sampled trajectories ([T(+1), N_local, ...]) -> ONE
    global batch sharded over the 'data' mesh axis (env axis = axis 1), so a
    single SPMD train step consumes every host's local experience and
    gradients all-reduce automatically (SURVEY §7 stage 6: per-host samplers
    feeding one global-mesh learner). No-op on single-host runs."""
    if not is_multihost():
        return traj
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    def spec(x):
        return P(None, "data", *([None] * (x.ndim - 2)))

    return jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(np.asarray(x), mesh, spec(x)), traj
    )


def globalize_replicated(tree: Any, mesh) -> Any:
    """Replicate a (host-identical) pytree onto the global mesh so it can be
    an input of a global SPMD program. No-op on single-host runs."""
    if not is_multihost():
        return tree
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    return jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(np.asarray(x), mesh, P()), tree
    )


def localize_replicated(tree: Any, mesh) -> Any:
    """Global replicated arrays -> process-local arrays (for host-driven
    per-process computations like sampler inference on local envs). No-op on
    single-host runs."""
    if not is_multihost():
        return tree
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    return jax.tree.map(
        lambda x: multihost_utils.global_array_to_host_local_array(x, mesh, P()), tree
    )


def sync_barrier(name: str = "barrier") -> None:
    if not is_multihost():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
