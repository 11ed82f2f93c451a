"""Device mesh construction (SURVEY.md 2.3 'Device mesh & launcher').

One mesh axis is enough for the proving workload: every bulk object (a
polynomial over the evaluation domain, an MSM point set) is sharded along a
single data axis; there is no tensor/pipeline split to express.  Multi-host
runs get the same 1-D mesh over all processes' devices — XLA routes
intra-slice legs over ICI and cross-slice legs over DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def shard_axis() -> str:
    return SHARD_AXIS


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the first `n_devices` (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Contiguous row shards: axis 0 split over the mesh, limbs replicated."""
    return NamedSharding(mesh, P(SHARD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
