"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip behavior (DP/EP sharding) is tested without a pod by forcing the
host platform to expose 8 devices — the same jitted programs then run
unchanged on a real TPU slice (SURVEY.md §4 "Implication for the rebuild").

Must set the env vars before the first ``import jax`` anywhere in the test
process, hence this lives at conftest import time.
"""
import os

# The environment's sitecustomize pins JAX_PLATFORMS=axon (the tunneled TPU);
# a plain setdefault is not enough — overwrite and also update jax.config
# after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh
    import numpy as np

    devs = np.array(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("data",))
