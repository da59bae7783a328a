"""In-process drives of the per-family training CLIs and the filter CLI's
main() — the thin launcher layer between argparse and the unified Trainer.

These modules (`train/resnet_train.py`, `train/resmoe.py`,
`train/pretrain.py`, `train/finetune.py`, `train/treevit.py`,
`infer/filter.py::main`) mirror the reference's per-family train scripts
(``TIC/ResNet/train.py``, ``TIC/ResMoE/train.py``, ``TIC/ViT/pretrain.py``,
``TIC/ViT/finetune.py``, ``TIC/TreeViT/train.py``) and are exercised at
scale by the chip tools (tools/family_compare.py); this battery pins their
argument wiring, preset overrides, and fit->test round trips on the CPU
mesh so a regression trips in the suite rather than mid-chip-run.
"""
import json
import os

import pytest

from fixtures import make_image_folder

N_CLASSES = 4


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    return make_image_folder(str(root), num_classes=N_CLASSES, per_class=8,
                             size=48)


@pytest.fixture()
def workdir(tmp_path, monkeypatch, corpus):
    """The presets freeze RELATIVE checkpoint/log/test dirs at import
    (config.py CHECKPOINT_DIR et al.), so pointing the CLIs at a scratch
    area is a chdir, exactly like a user launching from a run directory."""
    monkeypatch.chdir(tmp_path)
    # the presets' test_dir default is data/testset (config.py:27)
    testset = tmp_path / "data" / "testset"
    make_image_folder(str(testset), num_classes=N_CLASSES, per_class=2,
                      size=48)
    return tmp_path


def _common(corpus, batch=8):
    return ["--data-dir", corpus, "--no-resume", "--batch-size", str(batch),
            "--max-epochs", "1", "--seed", "0"]


def test_resnet_cli_fit_then_test(workdir, corpus):
    from touhouimageclassification_tpu.train import resnet_train

    fit_args = ["--depth", "18", *_common(corpus)]
    trainer = resnet_train.main(fit_args)
    assert trainer is not None
    # reload from the checkpoint the fit wrote and score the testset
    t2 = resnet_train.main(["--depth", "18", "--data-dir", corpus,
                            "--batch-size", "8", "--test"])
    res = t2.last_test_result
    assert 0.0 <= res["test_acc"] <= 1.0
    assert res["test_loss"] > 0


def test_resnet_cli_bn_variant_flag(workdir, corpus):
    from touhouimageclassification_tpu.train import resnet_train

    trainer = resnet_train.main(
        ["--depth", "18", "--bn-variant", "batch", *_common(corpus)])
    mpath = os.path.join("log", "ResNet_train", "metrics.jsonl")
    rows = [json.loads(l) for l in open(mpath)]
    assert any("train_loss" in r for r in rows)
    assert trainer.state is not None


def test_resmoe_cli_sparse_tiny(workdir, corpus):
    from touhouimageclassification_tpu.train import resmoe

    trainer = resmoe.main(["--routing", "sparse", "--tiny",
                           "--num-experts", "4", "--top-k", "2",
                           *_common(corpus)])
    assert trainer.state is not None
    # sparse runs persist per-epoch routing telemetry in metrics.jsonl
    # (task aux scalars are epoch-averaged by the trainer's single-fetch
    # scalar path)
    rows = [json.loads(l)
            for l in open(os.path.join("log", "ResMoE", "metrics.jsonl"))]
    epoch_rows = [r for r in rows if "train_loss" in r]
    assert epoch_rows, rows
    for key in ("balance_loss", "classification_loss", "drop_frac",
                "expert_load_max", "expert_load_min", "grad_norm"):
        assert key in epoch_rows[-1], (key, epoch_rows[-1])
    assert 0.0 <= epoch_rows[-1]["drop_frac"] <= 1.0


def test_pretrain_cli_is_scratch_finetune(workdir, corpus):
    from touhouimageclassification_tpu.train import pretrain

    trainer = pretrain.main(["--tiny", *_common(corpus)])
    assert trainer is None or trainer.state is not None  # run() may return None
    assert os.path.isdir("checkpoint")


def test_finetune_cli_warmup_horizon(workdir, corpus):
    """finetune's warmup_linear branch derives total_steps from the dataset
    size (reference finetune.py:318-328)."""
    from touhouimageclassification_tpu.train import finetune

    finetune.main(["--tiny", "--no-pretrained", *_common(corpus)])
    mpath = os.path.join("log", "ViT_finetune", "metrics.jsonl")
    if not os.path.exists(mpath):  # train_id differs per preset; find it
        logs = [d for d in os.listdir("log")
                if os.path.isdir(os.path.join("log", d))]
        assert logs, "finetune wrote no log dir"
        mpath = os.path.join("log", logs[0], "metrics.jsonl")
    rows = [json.loads(l) for l in open(mpath)]
    assert any("train_loss" in r for r in rows)


def test_treevit_cli_single_stage_and_map(workdir, corpus):
    from touhouimageclassification_tpu.train import treevit

    trainer = treevit.main(["--stage", "root", "--tiny",
                            "--num-categories", "2", *_common(corpus)])
    assert trainer.state is not None


def test_filter_main_csv_only(tmp_path, corpus):
    from touhouimageclassification_tpu.infer import filter as filt

    # a judge CSV marking half the images correct
    import csv as csvmod
    from touhouimageclassification_tpu.data.folder import scan_image_folder

    index = scan_image_folder(corpus)
    csv_path = tmp_path / "judge.csv"
    with open(csv_path, "w", newline="") as f:
        w = csvmod.writer(f)
        w.writerow(["filename", "predicted_class", "confidence",
                    "actual_class", "correct", "path"])
        for i, (path, cls) in enumerate(
                zip(index.paths, index.labels)):
            name = index.classes[cls]
            # the filter keeps rows where predicted == actual; mark odd
            # rows as mispredicted so exactly half survive
            pred = name if i % 2 == 0 else index.classes[(cls + 1)
                                                         % N_CLASSES]
            w.writerow([os.path.basename(path), pred, "0.9", name,
                        str(i % 2 == 0), path])
    out = tmp_path / "filtered"
    filt.main(["--csv-file", str(csv_path), "-od", str(out)])
    kept = sum(len(files) for _, _, files in os.walk(out))
    assert kept == (len(index.paths) + 1) // 2


def test_filter_main_arg_errors(tmp_path):
    from touhouimageclassification_tpu.infer import filter as filt

    with pytest.raises(SystemExit):
        filt.main(["-od", str(tmp_path / "o")])  # neither csv nor model
    with pytest.raises(SystemExit):
        filt.main(["-od", str(tmp_path / "o"), "--model", "vit-base"])


def test_filter_main_model_path_removes_temp_csv(tmp_path, corpus,
                                                 monkeypatch):
    """--model runs the judge then filters; without --csv-file the temp
    CSV must be cleaned up afterwards."""
    from touhouimageclassification_tpu.infer import filter as filt
    from touhouimageclassification_tpu.infer import serve as serve_mod

    monkeypatch.chdir(tmp_path)

    class FakePred:
        pass

    def fake_init(modelt=None, weights=None, data_dir=None, dp=0):
        return FakePred()

    def fake_judge(pred, image_dir, csv_path, canvas_cache="auto"):
        from touhouimageclassification_tpu.data.folder import scan_image_folder
        import csv as csvmod

        index = scan_image_folder(image_dir)
        with open(csv_path, "w", newline="") as f:
            w = csvmod.writer(f)
            w.writerow(["filename", "predicted_class", "confidence",
                        "actual_class", "correct", "path"])
            for path, cls in zip(index.paths, index.labels):
                name = index.classes[cls]
                w.writerow([os.path.basename(path), name, "0.9", name,
                            "True", path])

    monkeypatch.setattr(serve_mod, "init", fake_init)
    monkeypatch.setattr(serve_mod, "full_judge", fake_judge)
    out = tmp_path / "filtered"
    filt.main(["--model", "vit-base", "--image", corpus, "-od", str(out)])
    assert os.path.isdir(out)
    assert not os.path.exists("filter_temp.csv")
