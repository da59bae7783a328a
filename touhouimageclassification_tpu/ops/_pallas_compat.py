"""Backend shims for Pallas kernels.

Kernels compile with the Mosaic TPU backend on TPU and fall back to
interpreter mode elsewhere (CPU test mesh), so one code path is tested
everywhere. ``TIC_PALLAS_INTERPRET=1`` forces interpretation for debugging.
"""
from __future__ import annotations

import os

import jax

try:  # pltpu only imports cleanly where TPU support exists
    from jax.experimental.pallas import tpu as _pltpu

    VMEM = _pltpu.VMEM
    SMEM = _pltpu.SMEM
    ANY = _pltpu.ANY
except Exception:  # pragma: no cover
    import jax.experimental.pallas as _pl

    VMEM = SMEM = ANY = getattr(_pl, "ANY", None)


def should_interpret() -> bool:
    if os.environ.get("TIC_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() not in ("tpu", "axon")
