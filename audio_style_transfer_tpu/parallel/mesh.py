"""Device-mesh helpers.

The reference's distribution story is a TF1 gRPC parameter-server runtime
(reference nsynth/wavenet/train.py:71-80,103-108: ps/worker jobs,
``replica_device_setter``, ``SyncReplicasOptimizer``).  On TPU there are no
parameter servers: weights are replicated (the model is ~75 MB), gradients
are all-reduced over ICI with ``psum`` inside ``shard_map``, and scale-out
is expressed as a ``jax.sharding.Mesh`` + partition specs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_parallel_specs(axis_name: str = "data"):
    """(replicated, batch-sharded) partition specs for DP training."""
    return P(), P(axis_name)
