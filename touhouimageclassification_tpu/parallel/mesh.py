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
