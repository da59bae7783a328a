"""Multi-host DCN initialization, exercised for real.

SURVEY §5 comm-backend obligation: ``parallel/dist.py`` wraps
``jax.distributed.initialize``; this test runs TWO actual processes (each one
CPU device) through it — coordinator handshake, global 2-device mesh across
processes, and a cross-process reduction over a process-spanning global
array — so the multi-host story is tested code, not an untested wrapper.
"""
import os
import socket
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
from touhouimageclassification_tpu.parallel.dist import initialize_distributed

pid, port = int(sys.argv[1]), sys.argv[2]
assert initialize_distributed(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()

import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
assert len(devs) == 2, devs  # one local + one remote CPU device
mesh = Mesh(np.array(devs), ("data",))
local = np.full((1, 4), float(pid + 1), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (2, 4))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
assert float(total) == 12.0, float(total)  # (1+2)*4 -> cross-process reduce
print(f"multihost ok {pid}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_initialize_and_reduce():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(pid), str(port), _ROOT],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host children timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {pid} failed:\n{out}\n{err}"
        assert f"multihost ok {pid}" in out
