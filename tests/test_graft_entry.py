"""The driver's multichip artifact path must be self-contained.

Round-1 postmortem (VERDICT.md missing #1): the driver calls
``__graft_entry__.dryrun_multichip(8)`` with NO environment assistance; the
axon sitecustomize pins JAX_PLATFORMS to the tunneled single-chip TPU, so the
entry point must itself force an n-device virtual CPU mesh (by re-exec'ing in
a subprocess when the current process isn't already set up for one).
"""
import os

import __graft_entry__ as graft


def test_cpu_mesh_ready_detection(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    assert graft._cpu_mesh_ready(8)
    assert graft._cpu_mesh_ready(2)
    assert not graft._cpu_mesh_ready(16)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert not graft._cpu_mesh_ready(2)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "")
    assert not graft._cpu_mesh_ready(2)


def test_dryrun_reexecs_under_driver_env(monkeypatch):
    """Simulate the driver's environment (platform pinned to the TPU relay):
    dryrun_multichip must succeed by re-exec'ing itself CPU-forced."""
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    graft.dryrun_multichip(2)  # raises CalledProcessError on failure


def test_dryrun_inline_on_cpu_mesh():
    """Inside the test suite the 8-device CPU mesh is already forced, so the
    dryrun runs in-process (exercises the inline branch)."""
    assert os.environ.get("JAX_PLATFORMS") == "cpu"
    graft.dryrun_multichip(8)
