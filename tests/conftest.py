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

# ---------------------------------------------------------------------------
# quick tier: `pytest -m quick` runs one/two representative tests per
# subsystem in a few minutes (the full suite takes 25-30 min on this 1-core
# box). Curated here centrally so the tier stays visible and additions are
# one line. Keys: (file basename, test name without parametrization).
# ---------------------------------------------------------------------------
QUICK_TESTS = {
    # models
    ("test_models.py", "test_vit_forward_shape"),
    ("test_models.py", "test_resnet_train_mode_updates_stats"),
    # converter golden-logit parity (torch -> flax)
    ("test_convert.py", "test_vit_logit_parity"),
    # kernels
    ("test_attention.py", "test_forward_matches_reference_f32"),
    ("test_attention.py", "test_gradients_match_reference"),
    ("test_gelu.py", "test_fast_max_abs_error"),
    # augmentation (golden + mixing)
    ("test_augment_golden.py", "test_resize_matches_pil_bilinear"),
    ("test_augment.py", "test_mixup_soft_labels_sum_to_one"),
    # data loader
    ("test_native_loader.py", "test_host_loader_native_backend"),
    # trainer end-to-end + resume
    ("test_train_e2e.py", "test_vit_trains_and_learns"),
    ("test_train_e2e.py", "test_checkpoint_resume"),
    # parallel (8-device CPU mesh)
    ("test_parallel.py", "test_dp_step_matches_single_device"),
    # MoE / dispatch
    ("test_moe.py", "test_moe_sparse_matches_dense_with_ample_capacity"),
    # serving
    ("test_serve.py", "test_predict_bucket_padding"),
    ("test_serve.py", "test_full_judge_csv_schema_and_filter"),
    # applications
    ("test_webapps.py", "test_web_demo_get_and_post"),
    ("test_webapps.py", "test_reviewer_claim_approve_reject_undo"),
    # eval harness
    ("test_analysis.py", "test_run_sweep_reports_missing_checkpoints_per_row"),
    # crawler (fake-driver loop)
    ("test_crawler_driver.py", "test_crawl_keyword_downloads_until_limit"),
}


# ---------------------------------------------------------------------------
# TIC_COV=1: line coverage of the package via tools/linecov.py (PEP 669 —
# coverage.py is not installed on this box). Written to result/coverage.json
# at session end; render with `python tools/linecov.py report`.
# ---------------------------------------------------------------------------
_COV = None
if os.environ.get("TIC_COV") == "1":
    sys.path.insert(0, os.path.join(_ROOT, "tools"))
    from linecov import Collector

    _COV = Collector([os.path.join(_ROOT, d) for d in
                      ("touhouimageclassification_tpu", "web", "crawler",
                       "reviewer", "analysis")])
    _COV.start()


def pytest_sessionfinish(session, exitstatus):
    if _COV is not None:
        _COV.stop()
        _COV.write(os.path.join(_ROOT, "result", "coverage.json"))


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = os.path.basename(str(item.fspath))
        name = item.name.split("[")[0]
        if (base, name) in QUICK_TESTS:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh
    import numpy as np

    devs = np.array(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("data",))
