"""Parameter/state sharding rules.

DP baseline: everything replicated, batch split on ``data`` (mesh.py).
Expert parallelism (EP): MoE experts and TreeViT sons live as ONE stacked
array per parameter (leading axis = expert); sharding that axis over the
mesh's ``expert`` axis makes XLA/GSPMD partition the vmapped expert forward
across chips and insert the dispatch/combine collectives — the TPU-native
replacement for per-rank expert processes (SURVEY §2 EP row).

The rule is path-based so it applies uniformly to params AND optimizer state
(optax states mirror the params tree, so 'experts'/'sons' appear in their
paths too).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EXPERT_STACK_KEYS = ("experts", "sons")


def _path_names(path) -> list[str]:
    out = []
    for k in path:
        out.append(str(getattr(k, "key", getattr(k, "name", k))))
    return out


def state_shardings(state, mesh: Mesh, expert_axis: str = "expert"):
    """Pytree of NamedSharding for a TrainState (or any pytree): leaves on an
    expert stack get P(expert_axis) on dim 0, everything else replicated."""
    ep = expert_axis in mesh.axis_names and mesh.shape[expert_axis] > 1

    def rule(path, leaf):
        names = _path_names(path)
        if (
            ep
            and any(k in names for k in EXPERT_STACK_KEYS)
            and getattr(leaf, "ndim", 0) >= 1
            and leaf.shape[0] % mesh.shape[expert_axis] == 0
        ):
            return NamedSharding(mesh, P(expert_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, state)


def shard_state(state, mesh: Mesh, expert_axis: str = "expert"):
    shardings = state_shardings(state, mesh, expert_axis)
    if jax.process_count() == 1:
        return jax.device_put(state, shardings)
    # Multi-process: device_put cannot target non-addressable devices. A
    # host-local leaf (init runs replicated, so every process holds the FULL
    # value) has global_shape == local shape and JAX slices out each
    # process's addressable shard. A leaf that is ALREADY a process-spanning
    # global array (an Orbax multi-process restore) passes through as-is.
    import numpy as np

    def to_global(x, s):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x
        return jax.make_array_from_process_local_data(
            s, np.asarray(x), np.shape(x)
        )

    return jax.tree_util.tree_map(to_global, state, shardings)
