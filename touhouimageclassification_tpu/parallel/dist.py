"""Multi-host initialization over DCN.

Single-host runs (the common case, and all the reference ever did —
``devices=1``, ``TIC/ViT/ntrain.py:240``) are a no-op. On a multi-host TPU
slice, ``jax.distributed.initialize`` wires the hosts over DCN and the same
mesh code scales out — per the scaling-book recipe: DP gradient all-reduce
rides ICI within a slice, DCN across slices.
"""
from __future__ import annotations

import os


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-host JAX if the environment asks for it.

    Returns True when running multi-host. Controlled by explicit args or the
    standard JAX env vars; safe to call unconditionally at trainer startup.
    """
    import jax

    want = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if not want:
        return False
    # idempotent: staged CLIs (treevit --stage all) call their per-stage
    # run() — and therefore this — several times per process, and
    # jax.distributed.initialize hard-raises on a second call
    from jax._src import distributed as _jdist

    if getattr(_jdist.global_state, "client", None) is not None:
        return True
    # JAX only reads JAX_COORDINATOR_ADDRESS from the environment; the
    # COORDINATOR_ADDRESS spelling we accept as a trigger must be forwarded
    # explicitly or initialize() raises "coordinator_address should be
    # defined"
    jax.distributed.initialize(
        coordinator_address=(
            coordinator_address
            or os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS")
        ),
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
