"""Device mesh construction helpers.

The reference's "cluster" is Redis queues between single-GPU containers with
no intra-job collectives at all (SURVEY.md §2.1). Here the data path scales
over a ``jax.sharding.Mesh``: the corpus shards across the ``shard`` axis
(collectives ride ICI), and an optional ``dp`` axis replicates for QPS.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_shards: Optional[int] = None,
    axis_name: str = "shard",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over the corpus-shard axis (the common serving layout)."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_shards or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} shards but only {len(devices)} devices")
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def make_mesh_2d(
    dp: int,
    n_shards: int,
    axis_names=("dp", "shard"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D mesh: data-parallel replicas × corpus shards (BASELINE config #5:
    replica DP for QPS on top of sharded corpora)."""
    devices = list(devices if devices is not None else jax.devices())
    if dp * n_shards > len(devices):
        raise ValueError(f"need {dp * n_shards} devices, have {len(devices)}")
    grid = np.asarray(devices[: dp * n_shards]).reshape(dp, n_shards)
    return Mesh(grid, axis_names)


def shard_axis_size(mesh: Mesh, axis_name: str = "shard") -> int:
    return mesh.shape[axis_name]
