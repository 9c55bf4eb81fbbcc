"""Device-mesh utilities for multi-chip scaling.

The reference library is single-process (SURVEY.md §2.10); its TPU-native
analogue distributes the data-parallel axes of the proving workload — MSM
points, NTT coefficients, witness batches — across a `jax.sharding.Mesh`
with XLA collectives over ICI/DCN, orchestrated by `jax.shard_map`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(num_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_last(mesh: Mesh, rank: int) -> NamedSharding:
    """Sharding that splits the LAST axis (the batch axis in limb-major
    layout) across the data axis."""
    return NamedSharding(mesh, P(*([None] * (rank - 1) + [DATA_AXIS])))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
