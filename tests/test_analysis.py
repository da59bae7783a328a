"""Evaluation-harness aggregation (analysis/acc.py)."""
import csv
import os

from touhouimageclassification_tpu.analysis.acc import get_acc, run_sweep


def _write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "filename", "predicted_class", "confidence", "actual_class",
            "correct", "path"])
        w.writeheader()
        w.writerows(rows)


def test_get_acc(tmp_path):
    rows = [
        dict(filename="a.jpg", predicted_class="x", confidence="0.9",
             actual_class="x", correct="True", path="/a.jpg"),
        dict(filename="b.jpg", predicted_class="x", confidence="0.4",
             actual_class="y", correct="False", path="/b.jpg"),
        dict(filename="c.jpg", predicted_class="y", confidence="0.8",
             actual_class="y", correct="True", path="/c.jpg"),
    ]
    _write_csv(tmp_path / "m1.csv", rows)
    out = get_acc("m1", str(tmp_path))
    assert out == {"name": "m1", "acc": 2 / 3}


def test_run_sweep_uses_cached_csvs(tmp_path):
    """With per-model CSVs already present, the sweep aggregates without
    loading any model (the reference's caching behavior, acc.py:41-51)."""
    rows = [dict(filename="a.jpg", predicted_class="x", confidence="0.9",
                 actual_class="x", correct="True", path="/a.jpg")]
    _write_csv(tmp_path / "modelA.csv", rows)
    _write_csv(tmp_path / "modelB.csv", rows * 2)
    models = [("modelA", "vit-base", "nonexistent"), ("modelB", "vit-base", "nonexistent")]
    out = run_sweep(models=models, result_dir=str(tmp_path), recompute=False)
    assert [r["name"] for r in out] == ["modelA", "modelB"]
    assert all(r["acc"] == 1.0 for r in out)
    assert os.path.exists(tmp_path / "acc.csv")
