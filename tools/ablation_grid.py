"""Reproduction of the reference's ablation table at two scales.

The reference's core deliverable is a measured accuracy grid over 8
ablation launchers plus the filtering recipe (``doc/report.pdf`` p.8
Table 3, harness ``TIC/analysis/acc.py``). The real 120-class Pixiv corpus
is unavailable here (no dataset, no egress), so this runs the SAME presets,
the SAME finetune->filter->retrain recipe, and the SAME accuracy harness on
a synthetic corpus engineered so the two interventions measurably matter:

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

Two scales (``--scale``):

- ``fixture`` (round-3 artifact): 8 classes x 48, 40² canvases, --tiny
  dims at 32² input. Fast CI-class shakeout.
- ``pixiv`` (VERDICT r3 next #1): 24 classes x 48 = 1,152 training JPEGs
  at 1200x900 / quality 90 — the same scale and image statistics as the
  ``tools/bench_judge.py --e2e`` corpus — with a DeiT-Tiny-class model
  (``--small``) at the FULL 224² input, RandomResizedCrop from the 256
  canvas, the real canvas cache and staged uploads. The strongest
  available proxy for Table 3's sign structure without the real corpus.

Models are scratch-init (no pretrained snapshot exists in this
environment) with an LR suited to scratch training (the presets' 1e-5 is
tuned for a pretrained ViT-L backbone); everything else is the preset
verbatim (epochs, batch*, optimizer, augmentation recipe, mixup, early
stopping; *batch raised to 64 at pixiv scale for chip throughput).

Output: ``result/ablation_<scale>/acc.csv`` (the reference harness's
format), per-model CSVs, and ``grid.json`` with the run metadata.

Run (chip): python tools/ablation_grid.py --scale pixiv
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

# pixiv scale: the 1,152-image / 1200x900 shape of the bench corpus
PIXIV = dict(classes=24, train_per_class=48, test_per_class=12,
             height=900, width=1200)

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


def _hue_wheel(n):
    """n visually-distinct base colors (HSV wheel, alternating S/V rings so
    neighbors differ in more than hue)."""
    import colorsys

    cols = []
    for i in range(n):
        h = i / n
        s = 0.85 if i % 2 == 0 else 0.55
        v = 0.8 if i % 3 else 0.55
        cols.append([c * 255 for c in colorsys.hsv_to_rgb(h, s, v)])
    return np.asarray(cols, np.float32)


def _draw_pixiv(rng, cls, shifted, h, w, hues, yy, xx):
    """One (h, w, 3) uint8 'artwork': smooth gradient background (so JPEG
    files compress/decode like the bench corpus) + a class-identifying
    colored shape. Same canonical-vs-shifted contract as ``_draw``."""
    color = hues[cls] + rng.normal(0, 10, 3).astype(np.float32)
    base = (110 + 28 * np.sin(xx / (53.0 + 5 * (cls % 5)) + cls)
            + 22 * np.cos(yy / 71.0)).astype(np.float32)
    img = np.repeat(base[..., None], 3, axis=-1)
    img += rng.normal(0, 7, (h, w, 3)).astype(np.float32)

    s = min(h, w)
    if shifted:
        cy = rng.uniform(0.22 * h, 0.78 * h)
        cx = rng.uniform(0.22 * w, 0.78 * w)
        r = rng.uniform(0.10, 0.32) * s
    else:
        cy = h / 2 + rng.normal(0, 0.03 * s)
        cx = w / 2 + rng.normal(0, 0.03 * s)
        r = 0.24 * s * (1 + rng.normal(0, 0.06))

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
    img[mask] = color + rng.normal(0, 9, (int(mask.sum()), 3))

    if shifted:
        img = img * rng.uniform(0.55, 1.45)
        img = (img - img.mean()) * rng.uniform(0.6, 1.4) + img.mean()
        if rng.random() < 0.25:
            img = np.broadcast_to(
                img.mean(axis=-1, keepdims=True), img.shape).copy()
    return np.clip(img, 0, 255).astype(np.uint8)


def make_fixture_pixiv(root, rng, classes, train_per_class, test_per_class,
                       h, w):
    """Pixiv-scale corpus with the same noise/shift contract as the fixture
    maker. Persistent: regenerating 1,440 1200x900 JPEGs costs ~7 min on
    this 1-core box, so a completed tree (marker + truth map) is reused."""
    import json as _json

    from PIL import Image

    marker = os.path.join(root, ".complete")
    truth_path = os.path.join(root, ".truth.json")
    unfiltered = os.path.join(root, "unfiltered")
    testset = os.path.join(root, "testset")
    if os.path.exists(marker) and os.path.exists(truth_path):
        with open(truth_path) as f:
            truth = {k: int(v) for k, v in _json.load(f).items()}
        return unfiltered, testset, truth

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    names = [f"char_{c:02d}" for c in range(classes)]
    hues = _hue_wheel(classes)
    truth = {}
    for ci, name in enumerate(names):
        os.makedirs(os.path.join(unfiltered, name), exist_ok=True)
    for ci, name in enumerate(names):
        for i in range(train_per_class):
            noisy = rng.random() < NOISE_FRACTION
            true_cls = rng.integers(0, classes) if noisy else ci
            img = _draw_pixiv(rng, int(true_cls), False, h, w, hues, yy, xx)
            p = os.path.join(unfiltered, name, f"{i}.jpg")
            Image.fromarray(img).save(p, quality=90)
            truth[p] = int(true_cls)
    for ci, name in enumerate(names):
        d = os.path.join(testset, name)
        os.makedirs(d, exist_ok=True)
        for i in range(test_per_class):
            img = _draw_pixiv(rng, ci, True, h, w, hues, yy, xx)
            Image.fromarray(img).save(os.path.join(d, f"{i}.jpg"), quality=90)
    with open(truth_path, "w") as f:
        _json.dump(truth, f)
    open(marker, "w").close()
    return unfiltered, testset, truth


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


def filter_quality(filtered_dir, truth, unfiltered_root=None):
    """Fraction of kept images whose DIRECTORY label matches ground truth."""
    unfiltered_root = unfiltered_root or os.path.join(
        os.path.dirname(filtered_dir), "unfiltered")
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
            src = truth.get(os.path.join(unfiltered_root, cls_dir, f))
            cls_idx = int(cls_dir.split("_")[1])
            correct += (src == cls_idx)
    return kept, (correct / kept if kept else 0.0)


# The sign structure the reference's Table 3 exhibits (report.pdf p.8):
# each named comparison claims the first preset outscores the second.
# VERDICT r4 #6 asked for these to be machine-checked; the multi-seed rerun
# (r5) showed some single-seed "orderings" sit inside run noise, so each
# check carries PAIRED per-seed statistics (same seeds train both presets;
# pairing removes the seed-shared split/shuffle variance) and a
# classification: robust (|mean| > 2 SE), within_noise, or single_seed.
ORDERING_PAIRS = {
    "filtered_full_beats_noisy_unaug": ("nvit", "nvit_unfiltered_unaug"),
    "filtered_full_beats_noisy_full": ("nvit", "nvit_unfiltered"),
    "full_beats_no_generalization": ("nvit", "nvit_but_gen"),
    "full_beats_no_divide": ("nvit", "nvit_but_div"),
    "full_beats_no_mixup": ("nvit", "nvit_but_mix"),
    "full_beats_grey": ("nvit", "nvit_grey"),
    "unfiltered_aug_beats_unfiltered_unaug":
        ("nvit_unfiltered", "nvit_unfiltered_unaug"),
}


def evaluate_orderings(accs, seeds, precision):
    """(bool orderings on means, paired per-seed stats per comparison)."""
    def vals(preset):
        return [accs[preset if s is None else f"{preset}_s{s}"]
                for s in seeds]

    means = {p: float(np.mean(vals(p))) for p in PRESET_DATA}
    checks, stats = {}, {}
    for name, (hi, lo) in ORDERING_PAIRS.items():
        diff = np.asarray(vals(hi)) - np.asarray(vals(lo))
        mean = float(diff.mean())
        # the reference table reports ties for mixup/noisy-full; >= there
        ge = name in ("filtered_full_beats_noisy_full", "full_beats_no_mixup")
        checks[name] = mean >= 0 if ge else mean > 0
        se = (float(diff.std(ddof=1) / np.sqrt(len(diff)))
              if len(diff) > 1 else None)
        stats[name] = {
            "pair": [hi, lo],
            "paired_delta_mean": mean,
            "paired_delta_se": se,
            "seeds_pos": int((diff > 0).sum()),
            "seeds_neg": int((diff < 0).sum()),
            "classification": ("single_seed" if se is None
                               else "robust" if abs(mean) > 2 * se
                               else "within_noise"),
        }
    checks["filter_precision_above_tree"] = precision > 1 - NOISE_FRACTION
    checks["full_is_best_cell"] = all(means["nvit"] >= v
                                      for v in means.values())
    return checks, stats


def print_verdict(checks, ordering_stats):
    robust = [n for n, s in ordering_stats.items()
              if s["classification"] == "robust" and checks[n]]
    noise = [n for n, s in ordering_stats.items()
             if s["classification"] == "within_noise"]
    misses = [n for n, s in ordering_stats.items()
              if s["classification"] == "robust" and not checks[n]]
    print("ABLATION GRID:",
          "OK" if not misses else "ROBUST ORDERING MISS",
          f"robust={len(robust)} within_noise={len(noise)} "
          f"robust_miss={len(misses)}")
    for n, s in ordering_stats.items():
        se = s["paired_delta_se"]
        print(f"  {n:40s} {'+' if checks[n] else '-'} "
              f"delta {s['paired_delta_mean']:+.4f}"
              + (f" +- {se:.4f} ({s['classification']})" if se is not None
                 else " (single seed)"))


def reanalyze(out_dir):
    """Recompute orderings + paired stats from an existing grid.json
    (no training, no sweep — e.g. after upgrading the statistics)."""
    path = os.path.join(out_dir, "grid.json")
    with open(path) as f:
        meta = json.load(f)
    checks, stats = evaluate_orderings(meta["accs"], meta["seeds"],
                                       meta["filter_precision"])
    meta["orderings"], meta["ordering_stats"] = checks, stats
    with open(path, "w") as f:
        json.dump(meta, f, indent=1)
    print_verdict(checks, stats)
    return meta


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["fixture", "pixiv"], default="fixture")
    ap.add_argument("--fast", action="store_true",
                    help="fewer epochs (CPU shakeout, not the recorded run)")
    ap.add_argument("--work", default=None,
                    help="scratch dir (default /tmp/tic_ablation_<scale>)")
    ap.add_argument("--corpus", default="/tmp/tic_ablation_pixiv_corpus",
                    help="persistent corpus dir (pixiv scale only)")
    ap.add_argument("--out", default=None,
                    help="result dir (default <repo>/result/ablation_<scale>)")
    ap.add_argument("--classes", type=int, default=None,
                    help="override class count (CPU shakeout)")
    ap.add_argument("--per-class", type=int, default=None)
    ap.add_argument("--test-per-class", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None,
                    help="override the scale's batch size (CPU shakeout)")
    ap.add_argument("--seeds", default=None,
                    help="comma list of seeds: each preset cell trains once "
                         "per seed (isolated --train-id lineages) and the "
                         "Table-3 orderings are asserted on the per-preset "
                         "MEANS (VERDICT r4 #1). Default: one run at the "
                         "preset seed.")
    ap.add_argument("--reanalyze", action="store_true",
                    help="recompute orderings/statistics from the existing "
                         "grid.json only (no training, no sweep)")
    ap.add_argument("--resume", action="store_true",
                    help="reuse completed stages found in --work (recovery "
                         "from a crash or relay outage mid-grid): keeps the "
                         "work dir, skips the judge/filter stages if their "
                         "artifacts exist and every preset whose serving "
                         "export is already present")
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirname = "ablation_fixture" if args.scale == "fixture" else "ablation_pixiv"
    if args.reanalyze:
        return reanalyze(args.out or os.path.join(repo, "result", dirname))

    import jax
    if (os.environ.get("TIC_SMOKE_FORCE_CPU") == "1"
            or jax.default_backend() not in ("tpu", "axon")):
        jax.config.update("jax_platforms", "cpu")

    out_dir = args.out or os.path.join(repo, "result", dirname)
    work = os.path.abspath(args.work or f"/tmp/tic_{dirname}")
    if not args.resume:
        shutil.rmtree(work, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    rng = np.random.default_rng(42)
    if args.scale == "fixture":
        unfiltered, testset, truth = make_fixture(work, rng)
        model_flag, batch, lr, judge_lr = "--tiny", "16", "3e-3", "3e-3"
        judge_epochs = "2" if args.fast else "3"
        epochs_flag = ["--max-epochs", "4"] if args.fast else []
    else:
        p = dict(PIXIV)
        if args.classes:
            p["classes"] = args.classes
        if args.per_class:
            p["train_per_class"] = args.per_class
        if args.test_per_class:
            p["test_per_class"] = args.test_per_class
        unfiltered, testset, truth = make_fixture_pixiv(
            os.path.abspath(args.corpus), rng, p["classes"],
            p["train_per_class"], p["test_per_class"], p["height"], p["width"])
        # DeiT-Tiny-class scratch model at the full 224 input; LR suited to
        # scratch at batch 64 (the preset 1e-5 is a pretrained-ViT-L rate)
        model_flag, batch, lr, judge_lr = "--small", "64", "5e-4", "1e-3"
        judge_epochs = "2" if args.fast else "8"
        epochs_flag = ["--max-epochs", "4"] if args.fast else []
    if args.batch:
        batch = str(args.batch)
    # pixiv scale: pay JPEG decode once per train tree, not once per
    # preset-epoch (1,152 x 1200x900 images on a one-core host)
    cache_flag = ["--canvas-cache"] if args.scale == "pixiv" else []
    os.environ["TIC_CHECKPOINT_DIR"] = os.path.join(work, "checkpoint")
    os.environ["TIC_LOG_DIR"] = os.path.join(work, "log")
    os.environ["TIC_TEST_DIR"] = testset
    import touhouimageclassification_tpu.config as C
    C.CHECKPOINT_DIR = os.path.join(work, "checkpoint")
    C.LOG_DIR = os.path.join(work, "log")
    C.TEST_DIR = testset

    from touhouimageclassification_tpu.train import finetune, ntrain

    judge_dir = os.path.join(work, "serving", "judge")
    judge_csv = os.path.join(work, "judge.csv")
    filtered = os.path.join(work, "filtered")
    have_judge = (args.resume and os.path.isdir(judge_dir)
                  and os.path.exists(judge_csv) and os.path.isdir(filtered))
    if have_judge:
        # recovery path: recompute the stage-2 stats from its artifacts
        import csv as _csv

        with open(judge_csv, newline="") as f:
            rows = list(_csv.reader(f))[1:]
        tot = len(rows)
        judge_self_acc = (sum(r[4] == "True" for r in rows) / tot
                          if tot else 0.0)
        kept = sum(f.endswith(".jpg") for _, _, fs in os.walk(filtered)
                   for f in fs)
        print(f"=== judge + filter reused from {work} ===", flush=True)
    else:
        # --- stage 1: the filter judge (reference §3.4) -------------------
        print("=== judge finetune ===", flush=True)
        finetune.main([model_flag, "--no-pretrained", "--data-dir",
                       unfiltered, "--max-epochs", judge_epochs,
                       "--batch-size", batch, "--no-resume",
                       "--lr", judge_lr, "--schedule", "constant",
                       *cache_flag])
        finetune.main([model_flag, "--no-pretrained", "--data-dir",
                       unfiltered, "--transform", judge_dir])

        # --- stage 2: self-filter (reference filter.py) -------------------
        from touhouimageclassification_tpu.infer import serve as S
        from touhouimageclassification_tpu.infer.filter import \
            filter as filter_csv

        predictor = S.init(modelt="vit-base", weights=judge_dir,
                           data_dir=unfiltered)
        judge_self_acc = S.full_judge(predictor, unfiltered, judge_csv,
                                      progress=False,
                                      canvas_cache="on"
                                      if args.scale == "pixiv" else "auto")
        del predictor
        tot, kept = filter_csv(judge_csv, filtered)
    kept_n, precision = filter_quality(filtered, truth, unfiltered)
    print(f"filter: kept {kept}/{tot}; label precision in kept set "
          f"{precision:.3f} (unfiltered tree has {1 - NOISE_FRACTION:.2f})",
          flush=True)

    # --- stage 3: all ablation presets (x seeds) ---------------------------
    # Multi-seed protocol (VERDICT r4 #1): the judge/filter stage stays
    # single-run so every seed trains on the IDENTICAL filtered tree — the
    # seed then varies split/shuffle/init/augmentation streams only, and the
    # orderings are evaluated on per-preset means.
    seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
             else [None])
    batch_flag = ["--batch-size", batch] if args.scale == "pixiv" else []
    exports = []
    for preset, tree in PRESET_DATA.items():
        data = filtered if tree == "filtered" else unfiltered
        for seed in seeds:
            name = preset if seed is None else f"{preset}_s{seed}"
            seed_flags = ([] if seed is None
                          else ["--seed", str(seed), "--train-id", name])
            export = os.path.join(work, "serving", name)
            if args.resume and os.path.isdir(export) and os.listdir(export):
                print(f"=== preset {name} reused from {export} ===",
                      flush=True)
                exports.append((name, "vit-base", export))
                continue
            print(f"=== preset {name} (data={tree}) ===", flush=True)
            ntrain.main(["--preset", preset, model_flag, "--no-pretrained",
                         "--data-dir", data, "--no-resume", "--lr", lr,
                         *batch_flag, *epochs_flag, *cache_flag, *seed_flags])
            ntrain.main(["--preset", preset, model_flag, "--no-pretrained",
                         "--data-dir", data, "--transform", export,
                         *seed_flags])
            exports.append((name, "vit-base", export))

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

    # per-preset mean +- std over seeds (single-seed runs: mean == the acc)
    acc_mean, acc_std = {}, {}
    for preset in PRESET_DATA:
        vals = [accs[preset if s is None else f"{preset}_s{s}"]
                for s in seeds]
        acc_mean[preset] = float(np.mean(vals))
        acc_std[preset] = float(np.std(vals))
        if len(seeds) > 1:
            print(f"{preset:28s} mean {acc_mean[preset]:.4f} "
                  f"+- {acc_std[preset]:.4f}  {vals}", flush=True)

    checks, ordering_stats = evaluate_orderings(accs, seeds, precision)
    n_train = sum(f.endswith(".jpg") for _, _, fs in os.walk(unfiltered)
                  for f in fs)
    meta = {
        "scale": args.scale, "train_images": n_train,
        "noise_fraction": NOISE_FRACTION,
        "judge_self_acc": judge_self_acc,
        "filter_kept": kept, "filter_total": tot,
        "filter_precision": precision,
        "backend": jax.default_backend(),
        "fast": args.fast,
        "seeds": seeds, "accs": accs,
        "acc_mean": acc_mean, "acc_std": acc_std,
        "orderings": checks,
        "ordering_stats": ordering_stats,
    }
    with open(os.path.join(out_dir, "grid.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print_verdict(checks, ordering_stats)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
