"""Training-ACCURACY A/B of the BatchNorm variants (closes the semantics
question behind the round-4 perf result).

``tools/bench_bn.py`` measured ``bn_variant='stale'`` (normalize by the
running EMA so the normalize fuses into the conv epilogue) at **+18.6%**
ResNet-152 step throughput on chip. That left one open question: does
normalizing by slightly stale statistics cost accuracy? This tool answers
it with the established single-variable protocol — identical data, split,
recipe, and seeds per variant; only the BN statistics strategy differs —
on the Pixiv-scale corpus (24 classes x 48 train JPEGs at 1200x900, the
ablation grid's), scratch ResNet through the real resnet152 preset
(SGD 5e-2, StepLR(5, 0.25), batch 80, early stopping), scored on the
appearance-shifted testset.

Reference anchor: BN is half the layer count of the reference's ResNet
(``TIC/ResNet/model.py:296``); the preset mirrors ``TIC/ResNet/train.py:
213-241``.

Run (chip): python tools/bn_acc_ab.py
Run (CPU shakeout): TIC_SMOKE_FORCE_CPU=1 python tools/bn_acc_ab.py \
    --fast --depth 18
Output: result/bn_acc_ab.json + stdout table.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="flax,stale",
                    help="comma list of ops/batchnorm.py variants")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--depth", type=int, default=18,
                    help="ResNet depth (18 learns at this corpus scale; "
                         "152 is the perf-bench model but can't train from "
                         "scratch on 1k images)")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the preset's 25 (early stopping usually "
                         "fires first)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--corpus", default="/tmp/tic_ablation_pixiv_corpus")
    ap.add_argument("--work", default="/tmp/tic_bn_acc_ab")
    ap.add_argument("--fast", action="store_true",
                    help="tiny corpus + 2 epochs (CPU shakeout)")
    ap.add_argument("--resume", action="store_true",
                    help="keep --work and skip (variant, seed) cells whose "
                         "row file already exists (relay-outage recovery)")
    args = ap.parse_args(argv)

    import jax
    if (os.environ.get("TIC_SMOKE_FORCE_CPU") == "1"
            or jax.default_backend() not in ("tpu", "axon")):
        jax.config.update("jax_platforms", "cpu")

    from ablation_grid import PIXIV, make_fixture_pixiv

    rng = np.random.default_rng(42)
    p = dict(PIXIV)
    if args.fast:
        p.update(classes=4, train_per_class=10, test_per_class=4,
                 height=96, width=128)
        if args.corpus == ap.get_default("corpus"):
            args.corpus = "/tmp/tic_bn_acc_ab_fast_corpus"  # keep the shared
            # persistent corpus free of tiny shakeout trees
        if args.work == ap.get_default("work"):
            # and keep shakeout rows out of a later chip run's --resume
            args.work = "/tmp/tic_bn_acc_ab_fast"
    unfiltered, testset, _ = make_fixture_pixiv(
        os.path.abspath(args.corpus), rng, p["classes"],
        p["train_per_class"], p["test_per_class"], p["height"], p["width"])

    if not args.resume:
        shutil.rmtree(args.work, ignore_errors=True)
    rows_dir = os.path.join(args.work, "rows")
    os.makedirs(rows_dir, exist_ok=True)
    os.environ["TIC_CHECKPOINT_DIR"] = os.path.join(args.work, "checkpoint")
    os.environ["TIC_LOG_DIR"] = os.path.join(args.work, "log")
    import touhouimageclassification_tpu.config as C
    C.CHECKPOINT_DIR = os.path.join(args.work, "checkpoint")
    C.LOG_DIR = os.path.join(args.work, "log")

    from touhouimageclassification_tpu.config import PRESETS
    from touhouimageclassification_tpu.models.resnet import resnet
    from touhouimageclassification_tpu.train.cli import (
        build_loaders, dataset_num_classes, resolve_normalize_stats)
    from touhouimageclassification_tpu.train.trainer import Trainer

    base = dataclasses.replace(
        PRESETS["resnet152"], data_dir=unfiltered, test_dir=testset,
        canvas_cache=True)
    if args.epochs or args.fast:
        base = dataclasses.replace(base, max_epochs=args.epochs or 2)
    if args.batch or args.fast:
        base = dataclasses.replace(
            base, global_batch_size=args.batch or 16)
    base = resolve_normalize_stats(base)
    n_classes = dataset_num_classes(base)

    variants = args.variants.split(",")
    seeds = [int(s) for s in args.seeds.split(",")]
    rows = []
    for variant in variants:
        for seed in seeds:
            row_path = os.path.join(rows_dir, f"{variant}_s{seed}.json")
            if args.resume and os.path.exists(row_path):
                with open(row_path) as f:
                    rows.append(json.load(f))
                print(f"== {variant} seed {seed} reused from {row_path}",
                      flush=True)
                continue
            cfg = dataclasses.replace(
                base, train_id=f"bnab_{variant}_s{seed}", seed=seed)
            model = resnet(args.depth, num_classes=n_classes,
                           bn_variant=variant)
            trainer = Trainer(cfg, model=model)
            train, val, test, _ = build_loaders(cfg, trainer.out_size)
            hist = trainer.fit(train, val, resume=False)
            res = trainer.test(test)
            row = {
                "variant": variant, "seed": seed,
                "epochs_run": len(hist),
                "best_val_acc": float(max(h["val_acc"] for h in hist)),
                "final_val_acc": float(hist[-1]["val_acc"]),
                "final_train_loss": float(hist[-1]["train_loss"]),
                "test_acc": float(res["test_acc"]),
                "test_loss": float(res["test_loss"]),
            }
            rows.append(row)
            with open(row_path + ".tmp", "w") as f:
                json.dump(row, f)
            os.replace(row_path + ".tmp", row_path)
            print(f"== {variant} seed {seed}: test_acc {row['test_acc']:.4f} "
                  f"best_val {row['best_val_acc']:.4f} "
                  f"({row['epochs_run']} epochs)", flush=True)

    summary = {}
    for variant in variants:
        accs = [r["test_acc"] for r in rows if r["variant"] == variant]
        vals = [r["best_val_acc"] for r in rows if r["variant"] == variant]
        summary[variant] = {
            "test_acc_mean": float(np.mean(accs)),
            "test_acc_per_seed": accs,
            "best_val_acc_mean": float(np.mean(vals)),
        }
    meta = {
        "depth": args.depth, "seeds": seeds, "backend": jax.default_backend(),
        "fast": args.fast, "corpus_images": p["classes"] * p["train_per_class"],
        "rows": rows, "summary": summary,
    }
    out = os.path.join(_REPO, "result", "bn_acc_ab.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
