"""Input-pipeline scale test: one order of magnitude past the 1,152-image
corpus (VERDICT r4 #4).

The reference trains on ~132k Pixiv images (report.pdf p.1); every rebuild
run so far used <=1,152. This tool generates a ~12k-image corpus with the
same image statistics (1200x900, JPEG q90, the ablation grid's drawing
model) and runs the real `nvit` preset through the full input pipeline —
HostImageLoader + canvas cache + (seed,epoch)-keyed shuffle + staged
uploads — measuring what the 1,152-image runs could not:

- cold canvas-cache fill time at ~12k images (the ~26 GB full-132k design
  note at data/canvas_cache.py is extrapolated from this),
- steady-state epoch throughput vs the synthetic-data headline,
- a mid-epoch SIGTERM + exact-batch resume at scale (cadence machinery:
  partial checkpoint keyed by global step, set_epoch fast-forward —
  bit-identity itself is already proven on chip at 1,152 images by
  tools/chip_preempt_demo.py; here the assert is the resume marker and a
  completed run).

Corpus generation is resumable per class (~1h on this 1-core box; run
``--gen-only`` in the background, optionally nice'd, then the chip phase).

Run: python tools/scale_pipeline.py --gen-only   # corpus (CPU, ~1h)
     python tools/scale_pipeline.py              # chip phase
CPU shakeout: TIC_SMOKE_FORCE_CPU=1 python tools/scale_pipeline.py --fast
Output: result/scale_pipeline.json
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def ensure_corpus(root: str, classes: int, per_class: int,
                  test_per_class: int, h: int, w: int) -> tuple[str, str]:
    """Resumable generator: any class directory already holding its full
    image count is skipped, so an interrupted run (or a later run with a
    larger --per-class) only draws the missing files."""
    from PIL import Image

    from ablation_grid import _draw_pixiv, _hue_wheel

    train = os.path.join(root, "train")
    testset = os.path.join(root, "testset")
    hues = _hue_wheel(classes)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    t0 = time.time()
    made = 0
    for ci in range(classes):
        name = f"char_{ci:02d}"
        for base, n, shifted in ((train, per_class, False),
                                 (testset, test_per_class, True)):
            d = os.path.join(base, name)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                p = os.path.join(d, f"{i}.jpg")
                if os.path.exists(p):
                    continue
                # per-image RNG key -> regeneration order never matters
                r = np.random.default_rng(
                    (ci * 1_000_003 + i * 97 + (7 if shifted else 0)))
                img = _draw_pixiv(r, ci, shifted, h, w, hues, yy, xx)
                Image.fromarray(img).save(p + ".tmp", format="JPEG",
                                          quality=90)
                os.replace(p + ".tmp", p)
                made += 1
        if made:
            rate = made / max(time.time() - t0, 1e-9)
            print(f"[gen] class {ci + 1}/{classes} done "
                  f"({made} new, {rate:.1f} img/s)", flush=True)
    return train, testset


class KillAtBatch:
    """Raise a real SIGTERM right before yielding global batch ``n``
    (tools/chip_preempt_demo.py's trigger)."""

    def __init__(self, loader, n: int):
        self.loader, self.n, self.count = loader, n, 0

    def __getattr__(self, name):
        return getattr(self.loader, name)

    def __len__(self):
        return len(self.loader)

    def steps_per_epoch(self):
        return self.loader.steps_per_epoch()

    def set_epoch(self, *a):
        self.loader.set_epoch(*a)

    def __iter__(self):
        import signal

        for b in iter(self.loader):
            if self.count == self.n:
                os.kill(os.getpid(), signal.SIGTERM)
            self.count += 1
            yield b


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/tic_scale12k_corpus")
    ap.add_argument("--classes", type=int, default=24)
    ap.add_argument("--per-class", type=int, default=500)
    ap.add_argument("--test-per-class", type=int, default=12)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--work", default="/tmp/tic_scale12k_work")
    ap.add_argument("--gen-only", action="store_true",
                    help="generate/extend the corpus and exit")
    ap.add_argument("--fast", action="store_true",
                    help="small corpus + tiny dims (CPU shakeout)")
    args = ap.parse_args(argv)

    h, w = 900, 1200
    if args.fast:
        args.classes, args.per_class, args.test_per_class = 4, 40, 4
        h, w = 96, 128
        if args.corpus == ap.get_default("corpus"):
            args.corpus = "/tmp/tic_scale_fast_corpus"

    train_dir, testset = ensure_corpus(
        os.path.abspath(args.corpus), args.classes, args.per_class,
        args.test_per_class, h, w)
    n_train = args.classes * args.per_class
    if args.gen_only:
        print(f"corpus ready: {n_train} train images at {args.corpus}")
        return

    import jax
    if (os.environ.get("TIC_SMOKE_FORCE_CPU") == "1"
            or jax.default_backend() not in ("tpu", "axon")):
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    shutil.rmtree(args.work, ignore_errors=True)
    os.environ["TIC_CHECKPOINT_DIR"] = os.path.join(args.work, "checkpoint")
    os.environ["TIC_LOG_DIR"] = os.path.join(args.work, "log")
    import touhouimageclassification_tpu.config as C
    C.CHECKPOINT_DIR = os.path.join(args.work, "checkpoint")
    C.LOG_DIR = os.path.join(args.work, "log")

    from touhouimageclassification_tpu.config import PRESETS, ViTConfig
    from touhouimageclassification_tpu.models.vit import ViT
    from touhouimageclassification_tpu.train.cli import (
        SMALL_VIT_DIMS, TINY_VIT_DIMS, build_loaders, dataset_num_classes,
        resolve_normalize_stats)
    from touhouimageclassification_tpu.train.trainer import Trainer

    # drop any stale canvas cache so the fill is genuinely cold
    shutil.rmtree(os.path.join(train_dir, ".tic_canvas_cache"),
                  ignore_errors=True)

    cfg = dataclasses.replace(
        PRESETS["nvit"], data_dir=train_dir, test_dir=testset,
        pretrained=False, canvas_cache=True,
        global_batch_size=(8 if args.fast else args.batch),
        max_epochs=args.epochs, train_id="scale12k",
        optimizer=dataclasses.replace(PRESETS["nvit"].optimizer,
                                      learning_rate=5e-4),
    )
    cfg = resolve_normalize_stats(cfg)
    dims = TINY_VIT_DIMS if args.fast else SMALL_VIT_DIMS
    model = ViT(ViTConfig(**dims, num_classes=dataset_num_classes(cfg)))

    trainer = Trainer(cfg, model=model)
    train, val, test, _ = build_loaders(cfg, trainer.out_size)
    spe = train.steps_per_epoch()

    # SIGTERM strictly inside epoch 2 (>=2 steps in: the device_put iterator
    # prefetches one batch, so the flag is seen a step early)
    kill_at = spe + min(max(2, spe // 3), spe - 1)
    t0 = time.time()
    h1 = trainer.fit(KillAtBatch(train, kill_at), val, resume=False)
    t_preempted = time.time() - t0
    assert [r["epoch"] for r in h1] == [1], \
        f"SIGTERM should land inside epoch 2, trained {h1}"

    t2 = Trainer(cfg, model=model)
    train2, val2, test2, _ = build_loaders(cfg, t2.out_size)
    t0 = time.time()
    h2 = t2.fit(train2, val2, resume=True)
    t_resumed = time.time() - t0

    mpath = os.path.join(cfg.log_dir, cfg.train_id, "metrics.jsonl")
    with open(mpath) as f:
        records = [json.loads(line) for line in f]
    marks = [r for r in records if "resumed_mid_epoch" in r]
    assert marks and marks[-1]["resumed_mid_epoch"] == 2, marks
    epochs = [r for r in records if "train_loss" in r]
    # epoch 1 pays the cold cache fill; epochs 3+ of the resumed run are
    # pure steady state (epoch 2 is the partial post-resume epoch)
    fill_epoch = epochs[0]
    steady = [r for r in epochs if r["epoch"] >= 3] or epochs[-1:]
    res = t2.test(test2) if test2 is not None else {}

    cache_dir = os.path.join(train_dir, ".tic_canvas_cache")
    cache_bytes = sum(os.path.getsize(os.path.join(cache_dir, f))
                      for f in os.listdir(cache_dir)) \
        if os.path.isdir(cache_dir) else 0

    meta = {
        "backend": jax.default_backend(),
        "fast": args.fast,
        "train_images": n_train,
        "steps_per_epoch": spe,
        "batch": cfg.global_batch_size,
        "killed_at_global_batch": kill_at,
        "resume_start_batch": marks[-1]["start_batch"],
        "epoch1_cold_fill_seconds": fill_epoch["epoch_seconds"],
        "epoch1_cold_img_per_s": fill_epoch["images_per_second"],
        "steady_img_per_s": [r["images_per_second"] for r in steady],
        "steady_epoch_seconds": [r["epoch_seconds"] for r in steady],
        "final_train_loss": epochs[-1]["train_loss"],
        "first_epoch_train_loss": epochs[0]["train_loss"],
        "canvas_cache_bytes": cache_bytes,
        "wall_seconds_preempted_leg": t_preempted,
        "wall_seconds_resumed_leg": t_resumed,
        **{f"test_{k.split('_', 1)[1]}": float(v) for k, v in res.items()},
    }
    out = os.path.join(_REPO, "result", "scale_pipeline.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta, indent=1))


if __name__ == "__main__":
    main()
