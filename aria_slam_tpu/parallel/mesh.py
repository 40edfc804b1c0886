"""Device-mesh helpers.

The reference has no multi-device story (SURVEY.md §2.2-2.3: CUDA
streams only); the TPU framework's scaling axes are:
  - "data": parallel evaluation of frame batches / multiple sequences
    (DP — SURVEY.md §5.8 'batch-eval of many EuRoC sequences')
  - "model": sharding the loop-closure keyframe database and the
    detector's wide channels across chips (the project's analogue of
    sequence/tensor parallelism — SURVEY.md §5.7)
Collectives ride ICI via jax.sharding + shard_map; no explicit
NCCL-style code anywhere.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, rank: int) -> NamedSharding:
    """Shard the leading axis over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (rank - 1))))


def model_sharding(mesh: Mesh, rank: int) -> NamedSharding:
    """Shard the leading axis over 'model'."""
    return NamedSharding(mesh, P("model", *([None] * (rank - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
