"""Opt-in full-pipeline smoke (slow, ~5 min on CPU):

    TIC_RUN_SMOKE=1 python -m pytest tests/test_pipeline_smoke.py -q

Composes the complete reference reproduction recipe — finetune the filter
judge, export, self-filter, main training, accuracy sweep, serve — on a
fixture dataset (tools/pipeline_smoke.py).
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("TIC_RUN_SMOKE"),
    reason="slow end-to-end smoke; set TIC_RUN_SMOKE=1 to run",
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_full_pipeline(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", SMOKE_DIR=str(tmp_path / "smoke"))
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "pipeline_smoke.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PIPELINE SMOKE: OK" in out.stdout
