"""Multi-checkpoint accuracy sweep.

Parity with ``TIC/analysis/acc.py``: a pinned table of named checkpoints,
per-model result CSV cached under ``result/``, aggregate ``result/acc.csv``.
The reference shells out to a subprocess per model for CUDA memory isolation
(``acc.py:43-51``); jitted XLA graphs don't leak, so this version runs
in-process and just drops each Predictor when done.

CLI: ``python -m touhouimageclassification_tpu.analysis.acc [--recompute]``
"""
from __future__ import annotations

import csv
import os

from ..config import RESULT_DIR, TEST_DIR

# (model_name, model_type, checkpoint) — reference table at acc.py:13-25,
# paths pointing at converted/retrained artifacts of this build.
MODELS: list[tuple[str, str, str]] = [
    ("ResNet", "resnet", "checkpoint/serving/resnet152"),
    ("ResMoE", "resmoe", "checkpoint/serving/resmoe"),
    ("ViT_base", "vit-base", "checkpoint/serving/vit_base_finetune"),
    ("ViT_large", "vit-large", "checkpoint/serving/vit_large_finetune"),
    ("ViT_large_filtered", "vit-large", "checkpoint/serving/vit_large_filtered"),
    ("ViT_large_filtered_full_mixed", "vit-large", "checkpoint/serving/nvit"),
    ("ViT_large_filtered_grey_mixed", "vit-large", "checkpoint/serving/nvit_grey"),
    ("ViT_large_filtered_grey", "vit-large", "checkpoint/serving/nvit_grey_unmix"),
    ("ViT_large_full_mixed", "vit-large", "checkpoint/serving/nvit_unfiltered"),
    ("ViT_large_n", "vit-large", "checkpoint/serving/nvit_unfiltered_unaug"),
    ("ViT_large_full", "vit-large", "checkpoint/serving/nvit_unfiltered_unmix"),
]


def get_acc(name: str, result_dir: str = RESULT_DIR) -> dict:
    path = os.path.join(result_dir, f"{name}.csv")
    total = correct = 0
    with open(path) as f:
        for row in csv.DictReader(f):
            total += 1
            correct += row["correct"].strip() == "True"
    return {"name": name, "acc": correct / total if total else 0.0}


def run_sweep(
    models=None,
    test_dir: str = TEST_DIR,
    result_dir: str = RESULT_DIR,
    recompute: bool = False,
    data_dir: str | None = None,
    dp: int = 0,
    canvas_cache: str = "on",
) -> list[dict]:
    from ..infer import serve as serve_mod

    models = models if models is not None else MODELS
    os.makedirs(result_dir, exist_ok=True)
    rows: list[dict] = []
    for name, mtype, checkpoint in models:
        out_csv = os.path.join(result_dir, f"{name}.csv")
        if recompute or not os.path.exists(out_csv):
            # per-row guard: a sweep over the pinned table must not abort
            # because one artifact hasn't been trained/converted yet — skip
            # the row, record WHY, and keep scoring the others (the
            # reference's subprocess-per-model harness got this isolation
            # for free, acc.py:43-51)
            if not os.path.exists(checkpoint):
                print(f"{name}: checkpoint missing ({checkpoint}) — skipped")
                rows.append({"name": name, "acc": "",
                             "status": "missing_checkpoint"})
                continue
            predictor = serve_mod.init(
                modelt=mtype, weights=checkpoint,
                data_dir=data_dir or serve_mod.FILTERED_DATA_DIR, dp=dp,
            )
            # one test set scored 11x — 'on' by default here: the first
            # model's judge pays decode + cache fill, the other ten stream
            # the memmap ('auto' would never build one on a pristine set)
            serve_mod.full_judge(predictor, test_dir, out_csv,
                                 canvas_cache=canvas_cache)
            del predictor
        rows.append({**get_acc(name, result_dir), "status": "ok"})
    with open(os.path.join(result_dir, "acc.csv"), "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["name", "acc", "status"])
        writer.writeheader()
        writer.writerows(rows)
    return rows


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--recompute", "-r", action="store_true")
    parser.add_argument("--dp", type=int, default=0,
                        help="shard judging over this many devices")
    parser.add_argument("--canvas-cache", choices=["auto", "on", "off"],
                        default="on",
                        help="build/reuse the test set's decoded-canvas "
                             "cache across the 11-model sweep (default on: "
                             "decode once, stream 10x)")
    args = parser.parse_args()
    for row in run_sweep(recompute=args.recompute, dp=args.dp,
                         canvas_cache=args.canvas_cache):
        if row.get("status") == "missing_checkpoint":
            print(f"{row['name']}: (checkpoint missing)")
        else:
            print(f"{row['name']}: {row['acc']:.4f}")
