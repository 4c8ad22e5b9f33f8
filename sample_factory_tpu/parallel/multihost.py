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


class AmortizedEpisodeSums:
    """Accumulate per-iteration host-local episode sums and run the
    cross-process collective only every `every` lockstep iterations.

    `aggregate_episode_sums` costs one gloo/DCN round trip per call and acts
    as a barrier; calling it every training iteration puts that latency (and
    straggler wait) on the host-runner critical path. Episode stats only feed
    windowed averages and PBT objectives, which tolerate chunked delivery, so
    the sums accumulate locally and the collective is paid 1/`every` as
    often. All hosts flush on the same iteration count, so the result stays
    lockstep-deterministic and host-identical (the PBT agreement requirement,
    see `broadcast_objectives`). On non-flush iterations the numeric fields
    come back as zeros (windows simply receive nothing that iteration);
    non-numeric fields (e.g. `extra_stats`) pass through host-local every
    iteration. Up to `every - 1` trailing iterations of episode sums are
    dropped at shutdown — bounded and harmless for windowed stats.
    Single-host: transparent pass-through."""

    def __init__(self, every: int = 8):
        self.every = max(1, int(every))
        self._acc: Dict[str, Any] = {}
        self._n = 0

    def add(self, ep: Dict[str, Any]) -> Dict[str, Any]:
        if not is_multihost() or self.every == 1:
            return aggregate_episode_sums(ep)
        num_keys = sorted(
            k for k, v in ep.items() if isinstance(v, (int, float, np.floating, np.integer, np.ndarray))
        )
        for k in num_keys:
            v = np.asarray(ep[k], np.float64)
            self._acc[k] = v + self._acc[k] if k in self._acc else v.copy()
        self._n += 1
        out = dict(ep)
        if self._n >= self.every:
            flushed = aggregate_episode_sums(dict(self._acc))
            self._acc = {}
            self._n = 0
        else:
            flushed = None
        for k in num_keys:
            arr = np.asarray(ep[k])
            val = np.asarray(flushed[k]) if flushed is not None else np.zeros_like(arr, np.float64)
            out[k] = type(ep[k])(val) if isinstance(ep[k], (int, float)) else val.astype(arr.dtype, copy=False)
        return out

    def flush(self) -> Dict[str, Any] | None:
        """Global sums of pending local accumulations, or None if nothing is
        pending. Lockstep collective — call it on every host at the same
        point (the runners call it once on clean loop exit, so the last
        ``< every`` iterations of episode sums still reach the windows)."""
        if not is_multihost() or self._n == 0:
            return None
        flushed = aggregate_episode_sums(dict(self._acc))
        self._acc = {}
        self._n = 0
        return flushed


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

    def loc(x):
        # Fast path: a fully-replicated global array already holds its complete
        # value on every local device — take that shard directly instead of
        # dispatching a distributed reshard program (which costs cross-process
        # round trips per leaf per call; this sits on the per-iteration
        # critical path of the host-env runners, host_runner.py).
        if isinstance(x, jax.Array) and x.is_fully_replicated and len(x.addressable_shards) > 0:
            return x.addressable_data(0)
        return multihost_utils.global_array_to_host_local_array(x, mesh, P())

    return jax.tree.map(loc, tree)


def sync_barrier(name: str = "barrier") -> None:
    if not is_multihost():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
