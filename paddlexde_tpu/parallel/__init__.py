"""Mesh / sharding helpers: the TPU-native replacement for the reference's
``paddle.distributed`` data-parallel stack.

The reference's DP machinery — ``init_parallel_env``, ``DataParallel`` wrapper,
``DistributedBatchSampler``, manual ``fused_allreduce_gradients`` for non-module
lag params (``example/D3STN/train_dde.py:38,99-114,201-202,455-456`` in
DrownFish19/PaddleXDE) — collapses here into sharding annotations: one
``Mesh``, batch leaves sharded over the ``data`` axis, params replicated (or
sharded over ``model`` for tensor parallelism), and XLA inserts the gradient
all-reduces over ICI. The lag parameters need no special case: they are just
pytree leaves.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_sharding",
    "process_concat",
    "P",
    "Mesh",
    "NamedSharding",
]


def process_concat(x: np.ndarray) -> np.ndarray:
    """Concatenate a host-local numpy array across processes along axis 0.

    The multihost analogue of the reference's eval/test metric aggregation via
    ``dist.all_gather_object`` (``example/D3STN/train_dde.py:602-606, 635-649``
    in DrownFish19/PaddleXDE): every process contributes its local shard and
    receives the full global array. Identity when single-process, so
    single-host code paths need no jax.distributed setup. Requires the same
    local shape on every process (the wrap-padded per-process sampler
    guarantees it).
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.concatenate(list(gathered), axis=0)


def make_mesh(
    axis_shapes: Optional[dict] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a Mesh. Default: all devices on a single ``data`` axis.

    ``axis_shapes`` maps axis name -> size, e.g. ``{"data": 4, "model": 2}``;
    a size of -1 absorbs the remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axis_shapes:
        axis_shapes = {"data": len(devices)}
    names = list(axis_shapes)
    sizes = list(axis_shapes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def data_parallel_sharding(mesh: Mesh, axis: str = "data"):
    """(batch_sharding, replicated_sharding) pair for a DP step."""
    batch = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return batch, repl


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every leaf of ``batch`` with its leading dim sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate every leaf across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def initialize_distributed(**kwargs):
    """Multi-host entry: thin wrapper over jax.distributed.initialize()
    (the TPU-native analogue of the reference's dist.init_parallel_env,
    example/D3STN/train_dde.py:38). On TPU pods the coordinator/process
    arguments are discovered from the environment automatically."""
    jax.distributed.initialize(**kwargs)

