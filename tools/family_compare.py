"""Cross-family training comparison at Pixiv-corpus scale (VERDICT r4 #3).

The reference's report (p.7 section 4.1) orders the model families on its
132k-image corpus: scratch ResNet-152 (~68.2%) far above scratch ViT
(~30-40%), both far below the pretrained ViT-L (96.2%); ResMoE/TreeViT are
trained as WIP experiments. No pretrained snapshot or real corpus exists in
this environment, so this reproduces the SCRATCH half of that finding at
the strongest available scale: the 1,152-image / 24-class synthetic Pixiv
corpus (1200x900 q90 JPEGs, the ablation grid's), every family trained
through its REAL CLI (train/resnet_train.py, train/ntrain.py,
train/resmoe.py, train/treevit.py) with its own preset recipe, scored on
the appearance-shifted testset through the CLIs' --test path.

ResMoE routing dynamics are recorded too (VERDICT r4 weak #6): a
post-training pass over the train set measures the per-expert assignment
histogram and the capacity-drop rate of the sparse top-k dispatch
(reference objective TIC/ResMoE/train.py:21-36; dispatch
ops/moe_dispatch.py).

Run (chip): python tools/family_compare.py
Run (CPU shakeout): TIC_SMOKE_FORCE_CPU=1 python tools/family_compare.py --fast
Output: result/family_compare.json + stdout table.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def routing_stats(trainer, loader):
    """Expert-assignment histogram + capacity-drop rate of the restored
    sparse MoE over ``loader`` (mask-aware; the same gate/top-k/capacity
    math the dispatch plan applies, ops/moe_dispatch.py)."""
    import jax
    import jax.numpy as jnp

    from touhouimageclassification_tpu.data.loader import device_put_iterator
    from touhouimageclassification_tpu.ops import moe_dispatch as md

    model, task = trainer.model, trainer.task
    et = trainer.eval_transform
    cfg = task.cfg
    E, K = cfg.num_experts, cfg.top_k

    @jax.jit
    def step(state, batch, totals):
        images = et(batch["image"].astype(jnp.float32) / 255.0)
        outputs, _ = task.forward(
            model, {"params": state.params, **state.model_state}, images,
            batch, False, None)
        _logits, _gate, top_i = outputs
        b = top_i.shape[0]
        w = jnp.repeat(batch["mask"].astype(jnp.float32), K)
        counts = jnp.zeros((E,), jnp.float32).at[top_i.reshape(-1)].add(w)
        cap = md.capacity_for(b, K, E, cfg.capacity_factor)
        dropped = jnp.sum(jnp.maximum(counts - cap, 0.0))
        n = jnp.sum(w)
        return (totals[0] + counts, totals[1] + dropped, totals[2] + n)

    totals = (jnp.zeros((E,), jnp.float32), jnp.zeros((), jnp.float32),
              jnp.zeros((), jnp.float32))
    for batch in device_put_iterator(iter(loader), trainer._batch_sharding):
        totals = step(trainer.state, batch, totals)
    counts, dropped, total = (np.asarray(jax.device_get(t)) for t in totals)
    total = max(float(total), 1.0)
    return {
        "expert_load": [float(c) / total for c in counts],
        "assignments": [int(c) for c in counts],
        "drop_frac": float(dropped) / total,
        "capacity_factor": cfg.capacity_factor,
        "num_experts": E, "top_k": K,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--families",
                    default="resnet18,vit_small,resmoe_sparse,treevit",
                    help="comma list from: resnet18, resnet50, vit_small, "
                         "resmoe_sparse, treevit")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--corpus", default="/tmp/tic_ablation_pixiv_corpus")
    ap.add_argument("--work", default="/tmp/tic_family_compare")
    ap.add_argument("--batch", type=int, default=64,
                    help="batch for the ViT-family runs (the reference's "
                         "b4 x accum4 is tunnel-hostile; accumulation "
                         "schedules are preserved)")
    ap.add_argument("--vit-lr", default="5e-4",
                    help="scratch LR for the ViT run (the nvit preset's "
                         "1e-5 is a pretrained-backbone rate)")
    ap.add_argument("--moe-epochs", type=int, default=None)
    ap.add_argument("--moe-balance-loss", default=None,
                    choices=["quadratic", "switch"],
                    help="override the ResMoE gate balance penalty "
                         "(default: the preset's reference quadratic)")
    ap.add_argument("--moe-balance-alpha", default=None,
                    help="override the balance-loss mix weight")
    ap.add_argument("--moe-gateway-t", default=None,
                    help="override the gate's training noise scale")
    ap.add_argument("--out", default="family_compare.json",
                    help="output filename under result/ (set for balance-"
                         "loss A/Bs so the main comparison isn't clobbered)")
    ap.add_argument("--tree-epochs", type=int, default=6,
                    help="epochs per TreeViT stage (the preset's 2/stage "
                         "mirrors the reference WIP and underfits)")
    ap.add_argument("--fast", action="store_true",
                    help="tiny corpus + tiny dims + 2 epochs (CPU shakeout)")
    ap.add_argument("--resume", action="store_true",
                    help="keep --work and skip families whose per-family "
                         "row file already exists (recovery from a relay "
                         "outage mid-comparison)")
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
            args.corpus = "/tmp/tic_family_fast_corpus"
        if args.work == ap.get_default("work"):
            # keep shakeout rows out of a later chip run's --resume
            args.work = "/tmp/tic_family_fast_work"
    unfiltered, testset, _ = make_fixture_pixiv(
        os.path.abspath(args.corpus), rng, p["classes"],
        p["train_per_class"], p["test_per_class"], p["height"], p["width"])

    if not args.resume:
        shutil.rmtree(args.work, ignore_errors=True)
    rows_dir = os.path.join(args.work, "rows")
    os.makedirs(rows_dir, exist_ok=True)
    os.environ["TIC_CHECKPOINT_DIR"] = os.path.join(args.work, "checkpoint")
    os.environ["TIC_LOG_DIR"] = os.path.join(args.work, "log")
    os.environ["TIC_TEST_DIR"] = testset
    import touhouimageclassification_tpu.config as C
    C.CHECKPOINT_DIR = os.path.join(args.work, "checkpoint")
    C.LOG_DIR = os.path.join(args.work, "log")
    C.TEST_DIR = testset

    from touhouimageclassification_tpu.train import (ntrain, resmoe,
                                                     resnet_train, treevit)

    dims = "--tiny" if args.fast else "--small"
    batch = str(8 if args.fast else args.batch)
    seed_flags = ["--seed", str(args.seed)]
    common = ["--data-dir", unfiltered, "--no-resume", "--canvas-cache",
              *seed_flags]
    epochs = (["--max-epochs", "2"] if args.fast else [])
    moe_epochs = (["--max-epochs", str(args.moe_epochs)]
                  if args.moe_epochs else epochs)
    tree_epochs = (["--max-epochs", str(args.tree_epochs)]
                   if not args.fast else epochs)

    runs = {
        "resnet18": dict(
            mod=resnet_train,
            fit=["--depth", "18", *common, *epochs],
            note="scratch ResNet-18, full resnet preset recipe "
                 "(SGD 5e-2, StepLR(5,0.25), b80, 256^2)"),
        "resnet50": dict(
            mod=resnet_train,
            fit=["--depth", "50", *common, *epochs],
            note="scratch ResNet-50, same preset"),
        "vit_small": dict(
            mod=ntrain,
            fit=["--preset", "nvit", dims, "--no-pretrained",
                 "--lr", args.vit_lr, "--batch-size", batch,
                 "--train-id", "fam_vit", *common, *epochs],
            note="scratch DeiT-Tiny-class ViT, nvit preset recipe "
                 "(full augmentation + CutMix/MixUp)"),
        "resmoe_sparse": dict(
            mod=resmoe,
            fit=["--routing", "sparse", dims, "--batch-size", batch,
                 *(["--balance-loss", args.moe_balance_loss]
                   if args.moe_balance_loss else []),
                 *(["--balance-alpha", str(args.moe_balance_alpha)]
                   if args.moe_balance_alpha is not None else []),
                 *(["--gateway-t", str(args.moe_gateway_t)]
                   if args.moe_gateway_t is not None else []),
                 *common, *moe_epochs],
            note="sparse top-2-of-8 MoE of DeiT-Tiny-class experts, "
                 "resmoe preset objective (symmetric CE + load balance)"),
        "treevit": dict(
            mod=treevit,
            fit=["--stage", "all", dims, "--batch-size", batch,
                 *common, *tree_epochs],
            test_extra=["--stage", "full", dims, "--batch-size", batch],
            note="TreeViT staged curriculum (root -> sons -> full)"),
    }

    # each CLI logs under a fixed run name; the in-domain (unshifted
    # validation-split) accuracy lives in that run's metrics.jsonl
    log_names = {"resnet18": "ResNet_train", "resnet50": "ResNet_train",
                 "vit_small": "fam_vit", "resmoe_sparse": "ResMoE",
                 "treevit": "TreeViT_full"}

    def in_domain_val(fam):
        path = os.path.join(args.work, "log", log_names[fam],
                            "metrics.jsonl")
        best = final = None
        try:
            with open(path) as f:
                for line in f:
                    rec = json.loads(line)
                    if "val_acc" in rec:
                        final = float(rec["val_acc"])
                        best = final if best is None else max(best, final)
        except OSError:
            pass
        return best, final

    rows = []
    for fam in args.families.split(","):
        spec = runs[fam]
        row_path = os.path.join(rows_dir, f"{fam}.json")
        if args.resume and os.path.exists(row_path):
            with open(row_path) as f:
                row = json.load(f)
            if "val_acc_best" not in row:
                row["val_acc_best"], row["val_acc_final"] = in_domain_val(fam)
            rows.append(row)
            print(f"=== family {fam} reused from {row_path} ===", flush=True)
            continue
        print(f"=== family {fam}: {spec['note']} ===", flush=True)
        spec["mod"].main(spec["fit"])
        test_args = spec.get("test_extra",
                             [a for a in spec["fit"]
                              if a not in ("--no-resume",)])
        if "test_extra" in spec:
            test_args = [*spec["test_extra"], "--data-dir", unfiltered,
                         "--canvas-cache", *seed_flags]
        trainer = spec["mod"].main([*test_args, "--test"])
        res = dict(trainer.last_test_result)
        row = {"family": fam, "note": spec["note"],
               "test_acc": float(res["test_acc"]),
               "test_loss": float(res["test_loss"])}
        row["val_acc_best"], row["val_acc_final"] = in_domain_val(fam)
        if fam == "resmoe_sparse":
            from touhouimageclassification_tpu.train.cli import build_loaders
            train_loader, _, _, _ = build_loaders(trainer.cfg,
                                                  trainer.out_size)
            row["routing"] = routing_stats(trainer, train_loader)
            print(f"routing: {json.dumps(row['routing'])}", flush=True)
        rows.append(row)
        with open(row_path + ".tmp", "w") as f:
            json.dump(row, f)
        os.replace(row_path + ".tmp", row_path)
        print(f"== {fam}: test_acc {row['test_acc']:.4f}", flush=True)

    accs = {r["family"]: r["test_acc"] for r in rows}
    vals = {r["family"]: r.get("val_acc_best") for r in rows}
    orderings = {}
    if "resnet18" in accs and "vit_small" in accs:
        # the report's 4.1 finding: scratch CNN > scratch ViT on small data.
        # Scored twice: on the appearance-SHIFTED testset (the grid's
        # domain-shift design) and in-domain (validation split of the train
        # distribution — the closer analogue of the reference's single-
        # distribution corpus).
        orderings["scratch_resnet_beats_scratch_vit"] = (
            accs["resnet18"] > accs["vit_small"])
        if vals.get("resnet18") is not None and vals.get("vit_small") is not None:
            orderings["scratch_resnet_beats_scratch_vit_in_domain"] = (
                vals["resnet18"] > vals["vit_small"])
    meta = {
        "seed": args.seed, "fast": args.fast,
        "backend": jax.default_backend(),
        "corpus_images": p["classes"] * p["train_per_class"],
        "classes": p["classes"],
        "rows": rows, "orderings": orderings,
    }
    if args.moe_balance_loss or args.moe_balance_alpha is not None:
        meta["moe_balance_loss"] = args.moe_balance_loss or "quadratic"
        meta["moe_balance_alpha"] = args.moe_balance_alpha
    out = os.path.join(_REPO, "result", args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta, indent=1))


if __name__ == "__main__":
    main()
