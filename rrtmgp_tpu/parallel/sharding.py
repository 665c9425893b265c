"""Column sharding over device meshes.

The reference's only parallel strategy is embarrassingly-parallel domain
decomposition over columns (SURVEY.md section 2: ClimaComms threads / one CUDA
thread per column; multi-node handled by the host model with zero inter-rank
communication). The TPU-native equivalent: a 1-D device mesh over the column
axis, ``NamedSharding`` on every per-column array, lookup tables replicated.
No collectives exist on the hot path — XLA partitions the whole solve
per-device; scaling is pure column throughput over ICI/DCN.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
the same program runs SPMD across processes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_AXIS = "col"


def make_column_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name 'col'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (COLUMN_AXIS,))


def column_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for an array whose LAST axis is columns."""
    return NamedSharding(mesh, P(*([None] * 0), COLUMN_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _shard_leaf(x, mesh: Mesh, ncol: int):
    """Shard a pytree leaf on its trailing axis iff that axis is the column
    axis (size == ncol); replicate everything else (lookup tables, global-mean
    vmr vectors, scalars)."""
    if not hasattr(x, "ndim") or x.ndim == 0 or x.shape[-1] != ncol:
        return jax.device_put(x, replicated(mesh))
    spec = P(*([None] * (x.ndim - 1)), COLUMN_AXIS)
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_columns(tree, mesh: Mesh, ncol: int):
    """device_put a state/BC pytree with columns sharded over the mesh.

    ``ncol`` disambiguates the column axis from same-trailing-size non-column
    leaves; choose ncol a multiple of mesh size.
    """
    return jax.tree_util.tree_map(lambda x: _shard_leaf(x, mesh, ncol), tree)


def replicate(tree, mesh: Mesh):
    """device_put a pytree (e.g. lookup tables) fully replicated."""
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), tree)
