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


def make_hybrid_mesh(
    ici_axis: str = "data",
    dcn_axis: str = "slice",
    dcn_size: int | None = None,
) -> Mesh:
    """2-D mesh for multi-slice pods: fast axis over ICI, slow over DCN.

    Layout guidance (SURVEY.md §2d / scaling-book recipe): batch-shard over
    *both* axes, but place gradient reduce-scatter/all-gather so the large
    per-slice partial reductions ride ICI and only the slice-level partials
    cross DCN — which is what XLA does automatically when the mesh's major
    axis maps to slices (``mesh_utils.create_hybrid_device_mesh``).

    Falls back to a 1-D (ICI-only) mesh when a single slice is present.
    """
    devices = jax.devices()
    num_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if dcn_size is None:
        dcn_size = num_slices
    if dcn_size <= 1:
        return Mesh(np.asarray(devices).reshape(1, -1), (dcn_axis, ici_axis))
    from jax.experimental import mesh_utils

    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, len(devices) // dcn_size),
        dcn_mesh_shape=(dcn_size, 1),
        devices=devices,
    )
    return Mesh(arr, (dcn_axis, ici_axis))
