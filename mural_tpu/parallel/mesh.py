"""Device-mesh helpers.

The reference has no tensor parallelism (SURVEY.md section 2.3) -- its
workloads are embarrassingly parallel over sites/trials.  On TPU the
natural mapping is a 1-D ``data`` mesh: batches shard over it, parameters
replicate, and XLA inserts the (only needed) gradient all-reduce over ICI
when training data-parallel.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def stacked_batch_sharding(mesh: Mesh,
                           axis_name: str = "data") -> NamedSharding:
    """Shard axis 1 (the batch axis of K-stacked scan batches,
    data/prefetch.StackedDeviceBatch); the leading K axis replicates."""
    return NamedSharding(mesh, P(None, axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
