"""Full-pipeline composition smoke.

The reference README's reproduction recipe — finetune the filter judge,
export, self-filter, main training, accuracy sweep, serve — composed
end-to-end on a fixture dataset (tools/pipeline_smoke.py).

Two tiers:
- DEFAULT (always runs): tiny fixture/models/epochs, forced CPU backend,
  ~1 min on one core — the composition is CI-verified on every test run.
- FULL (opt-in, TIC_RUN_SMOKE=1): the larger fixture and epoch counts
  (~5 min), same script without the tiny knob.
"""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_smoke(tmp_path, tiny: bool, timeout: int):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        TIC_SMOKE_FORCE_CPU="1",
        SMOKE_DIR=str(tmp_path / "smoke"),
    )
    if tiny:
        env["TIC_SMOKE_TINY"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "pipeline_smoke.py")],
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PIPELINE SMOKE: OK" in out.stdout


def test_tiny_pipeline(tmp_path):
    """CI-default: the whole recipe composes (finetune -> filter -> ntrain ->
    acc -> serve) in ~1 min on CPU."""
    _run_smoke(tmp_path, tiny=True, timeout=480)


@pytest.mark.skipif(
    not os.environ.get("TIC_RUN_SMOKE"),
    reason="slow full-size smoke; set TIC_RUN_SMOKE=1 to run",
)
def test_full_pipeline(tmp_path):
    _run_smoke(tmp_path, tiny=False, timeout=900)
