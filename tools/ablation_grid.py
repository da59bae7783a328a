"""Fixture-scale reproduction of the reference's ablation table.

The reference's core deliverable is a measured accuracy grid over 8
ablation launchers plus the filtering recipe (``doc/report.pdf`` p.8
Table 3, harness ``TIC/analysis/acc.py``). The real 120-class Pixiv corpus
is unavailable here (no dataset, no egress), so this runs the SAME presets,
the SAME finetune->filter->retrain recipe, and the SAME accuracy harness on
a synthetic fixture engineered so the two interventions measurably matter:

- **filtering matters**: the 'unfiltered' train tree carries 25% label
  noise (images generated from class A, labeled B) — the reference's Pixiv
  tag noise. The ViT-Base judge is finetuned briefly (fits the clean
  majority pattern before the noise), then ``infer.filter`` builds the
  filtered tree. Ground truth is recorded, so the filter's precision is
  measured exactly (the analogue of report §3.4's 88% judge).
- **augmentation matters**: test images are appearance-shifted relative to
  the canonical training views (random sub-crops/scales, brightness/
  contrast jitter, occasional grayscale), so recipes with crop/color/grey
  augmentation generalize measurably better than 'unaug'.

Models run with --tiny dims (32², scratch init — no pretrained snapshot
exists in this environment) and LR 3e-3 (the presets' 1e-5 is tuned for a
pretrained ViT-L backbone); everything else is the preset verbatim
(epochs, batch, optimizer, augmentation recipe, mixup, early stopping).

Output: ``result/ablation_fixture/acc.csv`` (the reference harness's
format), per-model CSVs, and ``grid.json`` with the run metadata.

Run (chip): python tools/ablation_grid.py
Run (CPU):  TIC_SMOKE_FORCE_CPU=1 python tools/ablation_grid.py --fast
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLASSES = 8
TRAIN_PER_CLASS = 48
TEST_PER_CLASS = 12
NOISE_FRACTION = 0.25
CANVAS = 40

# preset -> which train tree it uses (mirrors config.PRESETS data_dir intent)
PRESET_DATA = {
    "nvit": "filtered",
    "nvit_but_gen": "filtered",
    "nvit_but_div": "filtered",
    "nvit_but_mix": "filtered",
    "nvit_grey": "filtered",
    "nvit_grey_unmix": "filtered",
    "nvit_unfiltered": "unfiltered",
    "nvit_unfiltered_unaug": "unfiltered",
    "nvit_unfiltered_unmix": "unfiltered",
}


def _draw(rng, cls, shifted):
    """One (CANVAS, CANVAS, 3) uint8 image of class `cls`.

    Class identity = hue + shape family. Canonical (train) views are
    centered at a fixed scale; `shifted` (test) views move/scale the shape
    and jitter brightness/contrast — the generalization gap augmentation
    is supposed to close.
    """
    hues = np.array([
        [200, 60, 60], [60, 200, 60], [60, 60, 200], [200, 200, 60],
        [200, 60, 200], [60, 200, 200], [230, 140, 40], [140, 90, 220],
    ], np.float32)
    color = hues[cls] + rng.normal(0, 12, 3)
    img = rng.normal(110, 18, (CANVAS, CANVAS, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:CANVAS, 0:CANVAS].astype(np.float32)

    if shifted:
        cy, cx = rng.uniform(10, CANVAS - 10, 2)
        r = rng.uniform(5, 14)
    else:
        cy, cx = CANVAS / 2 + rng.normal(0, 1.5, 2)
        r = 10 + rng.normal(0, 0.8)

    shape = cls % 4
    if shape == 0:      # disc
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
    elif shape == 1:    # square
        mask = (np.abs(yy - cy) < r * 0.85) & (np.abs(xx - cx) < r * 0.85)
    elif shape == 2:    # diamond
        mask = (np.abs(yy - cy) + np.abs(xx - cx)) < r * 1.2
    else:               # ring
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        mask = (d2 < r ** 2) & (d2 > (r * 0.55) ** 2)
    img[mask] = color + rng.normal(0, 8, (int(mask.sum()), 3))

    if shifted:
        img = img * rng.uniform(0.55, 1.45)             # brightness
        img = (img - img.mean()) * rng.uniform(0.6, 1.4) + img.mean()
        if rng.random() < 0.25:                         # occasional grey
            img = np.broadcast_to(
                img.mean(axis=-1, keepdims=True), img.shape
            ).copy()
    return np.clip(img, 0, 255).astype(np.uint8)


def make_fixture(root, rng):
    from PIL import Image

    names = [f"char_{c:02d}" for c in range(CLASSES)]
    truth = {}  # path -> true class index (label noise ground truth)

    unfiltered = os.path.join(root, "unfiltered")
    for ci, name in enumerate(names):
        os.makedirs(os.path.join(unfiltered, name), exist_ok=True)
    for ci, name in enumerate(names):
        for i in range(TRAIN_PER_CLASS):
            noisy = rng.random() < NOISE_FRACTION
            true_cls = rng.integers(0, CLASSES) if noisy else ci
            img = _draw(rng, int(true_cls), shifted=False)
            p = os.path.join(unfiltered, name, f"{i}.jpg")
            Image.fromarray(img).save(p, quality=92)
            truth[p] = int(true_cls)

    testset = os.path.join(root, "testset")
    for ci, name in enumerate(names):
        d = os.path.join(testset, name)
        os.makedirs(d, exist_ok=True)
        for i in range(TEST_PER_CLASS):
            img = _draw(rng, ci, shifted=True)
            Image.fromarray(img).save(os.path.join(d, f"{i}.jpg"), quality=92)
    return unfiltered, testset, truth


def filter_quality(filtered_dir, truth):
    """Fraction of kept images whose DIRECTORY label matches ground truth."""
    kept = correct = 0
    for cls_dir in sorted(os.listdir(filtered_dir)):
        full = os.path.join(filtered_dir, cls_dir)
        if not os.path.isdir(full) or cls_dir.startswith("."):
            continue
        for f in os.listdir(full):
            if not f.endswith(".jpg"):
                continue
            kept += 1
            # filter copies preserve the filename; map back to the source
            src = truth.get(os.path.join(
                os.path.dirname(filtered_dir), "unfiltered", cls_dir, f))
            cls_idx = int(cls_dir.split("_")[1])
            correct += (src == cls_idx)
    return kept, (correct / kept if kept else 0.0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="fewer epochs (CPU shakeout, not the recorded run)")
    ap.add_argument("--work", default="/tmp/tic_ablation_grid")
    ap.add_argument("--out", default=None,
                    help="result dir (default <repo>/result/ablation_fixture)")
    args = ap.parse_args(argv)

    import jax
    if (os.environ.get("TIC_SMOKE_FORCE_CPU") == "1"
            or jax.default_backend() not in ("tpu", "axon")):
        jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out or os.path.join(repo, "result", "ablation_fixture")
    work = os.path.abspath(args.work)
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    rng = np.random.default_rng(42)
    unfiltered, testset, truth = make_fixture(work, rng)
    os.environ["TIC_CHECKPOINT_DIR"] = os.path.join(work, "checkpoint")
    os.environ["TIC_LOG_DIR"] = os.path.join(work, "log")
    os.environ["TIC_TEST_DIR"] = testset
    import touhouimageclassification_tpu.config as C
    C.CHECKPOINT_DIR = os.path.join(work, "checkpoint")
    C.LOG_DIR = os.path.join(work, "log")
    C.TEST_DIR = testset

    from touhouimageclassification_tpu.train import finetune, ntrain

    judge_epochs = "2" if args.fast else "3"
    epochs_flag = ["--max-epochs", "4"] if args.fast else []

    # --- stage 1: the filter judge (reference §3.4) -----------------------
    print("=== judge finetune ===", flush=True)
    finetune.main(["--tiny", "--no-pretrained", "--data-dir", unfiltered,
                   "--max-epochs", judge_epochs, "--batch-size", "16",
                   "--no-resume", "--lr", "3e-3", "--schedule", "constant"])
    judge_dir = os.path.join(work, "serving", "judge")
    finetune.main(["--tiny", "--no-pretrained", "--data-dir", unfiltered,
                   "--transform", judge_dir])

    # --- stage 2: self-filter (reference filter.py) -----------------------
    from touhouimageclassification_tpu.infer import serve as S
    from touhouimageclassification_tpu.infer.filter import filter as filter_csv
    from touhouimageclassification_tpu.infer.serve import full_judge

    predictor = S.init(modelt="vit-base", weights=judge_dir,
                       data_dir=unfiltered)
    judge_csv = os.path.join(work, "judge.csv")
    judge_self_acc = full_judge(predictor, unfiltered, judge_csv,
                                progress=False)
    del predictor
    filtered = os.path.join(work, "filtered")
    tot, kept = filter_csv(judge_csv, filtered)
    kept_n, precision = filter_quality(filtered, truth)
    print(f"filter: kept {kept}/{tot}; label precision in kept set "
          f"{precision:.3f} (unfiltered tree has {1 - NOISE_FRACTION:.2f})",
          flush=True)

    # --- stage 3: all ablation presets ------------------------------------
    exports = []
    for preset, tree in PRESET_DATA.items():
        data = filtered if tree == "filtered" else unfiltered
        print(f"=== preset {preset} (data={tree}) ===", flush=True)
        ntrain.main(["--preset", preset, "--tiny", "--no-pretrained",
                     "--data-dir", data, "--no-resume", "--lr", "3e-3",
                     *epochs_flag])
        export = os.path.join(work, "serving", preset)
        ntrain.main(["--preset", preset, "--tiny", "--no-pretrained",
                     "--data-dir", data, "--transform", export])
        exports.append((preset, "vit-base", export))

    # --- stage 4: accuracy sweep through the reference harness ------------
    from touhouimageclassification_tpu.analysis.acc import run_sweep

    rows = run_sweep(
        models=[("judge_vit_base", "vit-base", judge_dir)] + exports,
        test_dir=testset, result_dir=out_dir, recompute=True,
        data_dir=unfiltered,
    )
    accs = {r["name"]: r["acc"] for r in rows}
    for r in rows:
        print(f"{r['name']:28s} {r['acc']:.4f}", flush=True)

    # --- orderings the reference table exhibits (report.pdf Table 3) ------
    checks = {
        "filtered_full_beats_noisy_unaug":
            accs["nvit"] > accs["nvit_unfiltered_unaug"],
        "filtered_full_beats_noisy_full":
            accs["nvit"] >= accs["nvit_unfiltered"],
        "filter_precision_above_tree":
            precision > 1 - NOISE_FRACTION,
    }
    meta = {
        "classes": CLASSES, "train_per_class": TRAIN_PER_CLASS,
        "test_per_class": TEST_PER_CLASS, "noise_fraction": NOISE_FRACTION,
        "judge_self_acc": judge_self_acc,
        "filter_kept": kept, "filter_total": tot,
        "filter_precision": precision,
        "backend": jax.default_backend(),
        "fast": args.fast, "accs": accs, "orderings": checks,
    }
    with open(os.path.join(out_dir, "grid.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("ABLATION GRID:", "OK" if all(checks.values()) else "ORDERING MISS",
          json.dumps(checks))
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
