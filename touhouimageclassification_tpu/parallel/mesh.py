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
    if num_data < 1 or num_expert < 1:
        # e.g. --expert-shards 16 on an 8-device slice: len//16 = 0 would
        # silently build a zero-device mesh that fails far downstream with a
        # cryptic device_put error
        raise ValueError(
            f"mesh ({num_data} data x {num_expert} expert) needs at least "
            f"{max(num_expert, 1)} devices, have {len(devices)}")
    if num_data * num_expert > len(devices):
        raise ValueError(
            f"mesh ({num_data} data x {num_expert} expert) = "
            f"{num_data * num_expert} devices, have {len(devices)}")
    if num_data * num_expert < len(devices):
        import logging

        logging.getLogger(__name__).warning(
            "mesh (%d data x %d expert) uses %d of %d devices; the rest idle",
            num_data, num_expert, num_data * num_expert, len(devices))
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


def process_input_view(sharding: NamedSharding) -> tuple[int, int]:
    """(shard_index, num_shards) of THIS process's slice of a global batch
    whose leading dim is sharded as ``sharding.spec[0]``.

    ``jax.process_count()`` is the right split only when the batch axis
    aligns with process boundaries. In general each process must supply
    exactly the rows its devices own: processes whose devices cover the
    same batch-axis coordinates (e.g. a pure-EP ``(data=1, expert=P)``
    mesh, where the batch is replicated across hosts) belong to the same
    input shard and must load IDENTICAL data — give them the same index.

    Returns (0, 1) when the batch dim is unsharded or single-process.
    """
    if jax.process_count() == 1:
        return (0, 1)
    mesh = sharding.mesh
    spec0 = sharding.spec[0] if len(sharding.spec) else None
    if spec0 is None:
        return (0, 1)  # replicated batch: every host loads everything
    axes = spec0 if isinstance(spec0, tuple) else (spec0,)
    axis_ids = [mesh.axis_names.index(a) for a in axes]
    # per-process set of batch-axis coordinate tuples its devices cover
    owners: dict[int, set] = {}
    for idx in np.ndindex(mesh.devices.shape):
        coord = tuple(idx[i] for i in axis_ids)
        owners.setdefault(mesh.devices[idx].process_index, set()).add(coord)
    axis_sizes = [mesh.shape[a] for a in axes]
    return _view_from_owners(owners, jax.process_index(), axis_sizes)


def _view_from_owners(owners: dict, me: int, axis_sizes) -> tuple[int, int]:
    """Pure core of :func:`process_input_view`: group processes by the
    batch-axis coordinate sets their devices cover and return
    (group_index_of_me, group_count). Unit-testable with synthetic
    ownership maps (a real grouped layout needs 4+ processes)."""
    if me not in owners:
        raise ValueError(
            "this process owns no devices in the mesh, so it has no input "
            "shard to load; build the mesh over devices of every "
            "participating process (or exclude this process from the run)"
        )

    def ranks(group):
        return sorted(int(np.ravel_multi_index(c, axis_sizes)) for c in group)

    groups = sorted({frozenset(v) for v in owners.values()},
                    key=lambda g: min(ranks(g)))
    union = set().union(*groups)
    contiguous = all(
        r[-1] - r[0] + 1 == len(r) for r in (ranks(g) for g in groups)
    )
    if (len({len(g) for g in groups}) != 1
            or sum(len(g) for g in groups) != len(union)
            or not contiguous):
        raise ValueError(
            "device-to-process layout does not tile the batch axis into "
            "equal, disjoint, contiguous process groups; re-order mesh "
            f"devices so each host owns a contiguous slab (got groups "
            f"{[ranks(g) for g in groups]})"
        )
    mine = frozenset(owners[me])
    return (groups.index(mine), len(groups))


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
