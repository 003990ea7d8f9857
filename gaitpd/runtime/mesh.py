"""Device mesh and sharding layer — the framework's replacement for the
reference's process-level GPU farming (run_all.sh:13-26; see SURVEY.md §2.5:
the reference has no in-process parallelism at all).

Data parallelism rides the ICI "data" axis of a jax.sharding.Mesh: batches
are sharded on their leading axis, parameters replicated, and XLA inserts the
gradient psum when the jitted step consumes sharded operands. A second
(outer) DCN axis can be added for multi-slice later; model sizes here
(~1e4-1e5 params) make TP/PP/EP out of scope by design.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a pytree of batch arrays with batch-axis sharding (leading
    dim must be divisible by the mesh size — the padded-batch pipeline
    guarantees that)."""
    sh = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k


def make_mesh_2d(
    n_slices: int,
    per_slice: Optional[int] = None,
    dcn_axis: str = "slices",
    ici_axis: str = "data",
) -> Mesh:
    """Two-level mesh for multi-slice scaling: an outer DCN axis over slices
    and an inner ICI axis within each slice (SURVEY.md §5 'optional outer DCN
    axis'). Batch sharding over BOTH axes keeps the gradient psum hierarchical
    (XLA reduces within-slice over ICI first, then across slices over DCN)."""
    devs = jax.devices()
    per_slice = per_slice or len(devs) // n_slices
    n = n_slices * per_slice
    grid = np.asarray(devs[:n]).reshape(n_slices, per_slice)
    return Mesh(grid, (dcn_axis, ici_axis))


def batch_sharding_2d(mesh: Mesh) -> NamedSharding:
    """Shard the batch over both mesh axes (DP across slices and chips)."""
    return NamedSharding(mesh, P(mesh.axis_names))
