"""Device mesh construction and axis conventions.

The framework's parallelism is expressed as a single `jax.sharding.Mesh`
with named axes — the TPU-native replacement for the reference's
NCCL/Accelerate DDP stack (SURVEY.md §2c, §5.8):

- "data":  batch sharding (DDP analogue; gradient psum rides ICI/DCN).
           Also used to shard parameters when fsdp=True (ZeRO-3 analogue).
- "model": tensor parallelism over attention heads / MLP hidden dim.

Evaluation/generation workloads shard the batch of rollouts over the whole
mesh ("data" x "model" flattened) — the scaling dimension that matters for
the 1xgpt workload is thousands of candidate futures, not the tiny T/S axes
(SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    Args:
        dp: data-parallel degree; default = num_devices // tp.
        tp: tensor/model-parallel degree.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def rollout_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a batch of rollouts over *all* mesh devices (data x model)."""
    return NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global_batch(local_batch, mesh: Mesh) -> jax.Array:
    """Assemble a globally batch-sharded array from per-host local data.

    Single-process: a plain device_put. Multi-host (jax.distributed): each
    host contributes its ShardedBatchLoader slice and the result is a global
    array over the full mesh — the TPU-native replacement for DDP samplers
    (SURVEY.md §5.8).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)
