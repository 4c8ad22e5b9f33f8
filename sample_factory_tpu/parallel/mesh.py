"""Device mesh and sharding layout.

This replaces the reference's distributed backend (SURVEY.md §2.4: faster-fifo
queues + shared-memory tensors + CUDA_VISIBLE_DEVICES placement) with JAX
sharding: envs and trajectories are sharded over the 'data' mesh axis, params
are replicated, and jit's SPMD partitioner turns gradient reductions into
psums over ICI. A 'model' axis is reserved for tensor parallelism of wide
layers (rarely needed at these model sizes, but first-class in the layout).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg=None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    model = getattr(cfg, "mesh_model", 1) if cfg is not None else 1
    data = getattr(cfg, "mesh_data", -1) if cfg is not None else -1
    if data <= 0:
        data = len(devices) // model
    assert data * model == len(devices), (
        f"mesh {data}x{model} does not cover {len(devices)} devices; set --mesh_data/--mesh_model"
    )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env/batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_axis(tree: Any, mesh: Mesh, env_axis_size: Optional[int] = None) -> Any:
    """Place a pytree on the mesh: leaves whose dim 0 is the env axis are
    sharded over 'data', everything else (PRNG keys, scalars) is replicated."""
    if env_axis_size is None:
        # infer: the most common dim-0 size across array leaves
        from collections import Counter

        sizes = Counter(x.shape[0] for x in jax.tree.leaves(tree) if hasattr(x, "ndim") and x.ndim >= 1)
        env_axis_size = sizes.most_common(1)[0][0]

    shards = mesh.shape[DATA_AXIS]

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == env_axis_size and x.shape[0] % shards == 0:
            return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(place, tree)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)


def shard_params_tp(tree: Any, mesh: Mesh, min_width: int = 512) -> Any:
    """Tensor parallelism: place wide layers' parameters sharded over 'model'.

    Shape-based GSPMD placement hints (the reference has no TP at all,
    SURVEY.md §2.3 — this is a new capability): the output/feature axis (last
    dim) of any kernel that is wide enough and divides evenly is sharded over
    the 'model' mesh axis; matching-width 1-D leaves (biases, scales) are
    sharded the same way; everything else is replicated. The SPMD partitioner
    propagates these shardings through the jitted step and inserts the
    collectives, so correctness never depends on the heuristic — only layout
    efficiency does. Optimizer-state leaves mirror parameter shapes and pick
    up identical placements.
    """
    shards = mesh.shape[MODEL_AXIS]
    if shards <= 1:
        return replicate_tree(tree, mesh)

    def place(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        width = x.shape[-1] if x.ndim >= 2 else x.shape[0]
        if width >= min_width and width % shards == 0:
            spec = P(*([None] * (x.ndim - 1)), MODEL_AXIS)
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(place, tree)


def num_data_shards(mesh: Optional[Mesh]) -> int:
    return mesh.shape[DATA_AXIS] if mesh is not None else 1
