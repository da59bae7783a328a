"""Device-mesh construction and sharding shorthands.

The training strategy (SURVEY §2 parallelism table): batch sharded over a
``data`` axis, parameters replicated — XLA inserts the gradient all-reduce
over ICI. An optional ``expert`` axis supports expert-parallel sparse MoE
(``models/resmoe.py``). The same code runs on 1 chip, a v5e-8 slice, or an
8-device virtual CPU mesh in tests.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    num_data: int | None = None,
    num_expert: int = 1,
    data_axis: str = "data",
    expert_axis: str = "expert",
    devices=None,
) -> Mesh:
    """Build a (data, expert) mesh over the available devices.

    ``num_data=None`` uses all devices not consumed by the expert axis.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_expert
    use = devices[: num_data * num_expert].reshape(num_data, num_expert)
    return Mesh(use, (data_axis, expert_axis))


def data_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Batch sharding: leading dim split over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _global_shape(local_shape, sharding: NamedSharding):
    """Global array shape for a per-process ``local_shape`` under ``sharding``.

    Each dim grows by (mesh axis size / number of coordinates of that axis
    covered by this process's devices) — so an axis that lives entirely
    within one process (e.g. ``expert`` on a single-host slice) contributes
    ×1, and a ``data`` axis spanning P processes contributes ×P.
    """
    mesh = sharding.mesh
    mine = np.array(
        [d.process_index == jax.process_index() for d in mesh.devices.flat]
    ).reshape(mesh.devices.shape)
    shape = list(local_shape)
    for dim, entry in enumerate(sharding.spec):
        if entry is None:
            continue
        for axis in entry if isinstance(entry, tuple) else (entry,):
            ai = mesh.axis_names.index(axis)
            covered = np.any(
                mine, axis=tuple(i for i in range(mine.ndim) if i != ai)
            )
            shape[dim] *= mesh.shape[axis] // int(covered.sum())
    return tuple(shape)


def make_global_array(x, sharding: NamedSharding):
    """Assemble a global ``jax.Array`` from this process's local data.

    Multi-host building block (scaling-book input-pipeline recipe): every
    process passes only the rows its devices own (or the full value for a
    replicated leaf) and the result is one global array the jitted SPMD
    step consumes — no host ever materializes another host's shard.
    """
    x = np.asarray(x)
    return jax.make_array_from_process_local_data(
        sharding, x, _global_shape(x.shape, sharding)
    )


def put_global(tree, sharding: NamedSharding):
    """``jax.device_put(tree, sharding)`` that also works multi-process.

    Single-process: plain ``device_put``. Multi-process: each leaf is
    assembled via :func:`make_global_array` (``device_put`` cannot place
    host data onto non-addressable devices). One sharding for all leaves.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(lambda x: make_global_array(x, sharding), tree)
