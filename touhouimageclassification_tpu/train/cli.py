"""Shared training-CLI plumbing: dataset assembly, run loop, serving export.

Reference surface: every trainer entry point takes ``--restore`` (checkpoint
path / resume), ``--test`` (evaluate on the test set), ``--transform``
(export a training checkpoint to serving weights) — ``TIC/ViT/ntrain.py:
178-194``, ``TIC/ResMoE/train.py:151-185``.
"""
from __future__ import annotations

import argparse
import math
import os

from ..config import TrainConfig
from ..data.folder import random_split, scan_image_folder
from ..data.loader import HostImageLoader
from .checkpoint import CheckpointManager, save_params
from .trainer import Trainer


def resolve_normalize_stats(cfg: TrainConfig) -> TrainConfig:
    """``normalize_stats='dataset'`` -> fill cfg.augment.mean/std with the
    cached per-dataset statistics (the hand-rolled reference paths' behavior,
    ``preprocess.py get_transforms``); 'imagenet' keeps the defaults."""
    if cfg.normalize_stats != "dataset":
        return cfg
    import dataclasses

    from ..config import get_image_size
    from ..utils.mean_std import get_mean_std

    mean, std = get_mean_std(cfg.data_dir, get_image_size(cfg.model_type))
    aug = dataclasses.replace(
        cfg.augment, mean=tuple(float(m) for m in mean),
        std=tuple(float(s) for s in std),
    )
    return dataclasses.replace(cfg, augment=aug)


# dims for --tiny CI/CPU smoke runs, shared by the training CLIs
TINY_VIT_DIMS = dict(image_size=32, patch_size=16, hidden_size=32,
                     num_layers=1, num_heads=2, mlp_dim=64)

# dims for --small runs: a real ViT (DeiT-Tiny-class) at the FULL 224 input,
# so the whole augmentation/serve pipeline runs at production shapes while a
# from-scratch model still fits Pixiv-scale corpora in minutes on one chip
# (the pixiv-scale ablation grid's trainee, tools/ablation_grid.py)
SMALL_VIT_DIMS = dict(image_size=224, patch_size=16, hidden_size=192,
                      num_layers=6, num_heads=3, mlp_dim=768)


def dataset_num_classes(cfg: TrainConfig) -> int:
    """Class count from the training data's class map (what serving will use
    via ``get_class_to_idx`` — the model head must match it)."""
    from ..data.folder import get_class_to_idx

    return len(get_class_to_idx(cfg.data_dir))


def canvas_for(cfg: TrainConfig, out_size: tuple[int, int]) -> tuple[int, int]:
    """Host decode canvas: RandomResizedCrop recipes keep ~8/7 headroom
    (224 -> 256) so zoom-out crops retain detail; other recipes decode
    straight to the model size."""
    aug = cfg.augment
    rrc = aug.enable_augmentation and not aug.only_grey_augmentation and aug.enable_generalization
    if not rrc:
        return out_size
    return tuple(int(math.ceil(s * 8 / 7 / 8) * 8) for s in out_size)


def build_loaders(cfg: TrainConfig, out_size: tuple[int, int]):
    """train/val from cfg.data_dir (random split, seed cfg.seed); test from
    cfg.test_dir when it exists."""
    index = scan_image_folder(cfg.data_dir)
    tr_idx, va_idx = random_split(len(index), cfg.train_split, cfg.seed)
    canvas = canvas_for(cfg, out_size)
    train = HostImageLoader(index, tr_idx, batch_size=cfg.global_batch_size,
                            canvas=canvas, shuffle=True, seed=cfg.seed,
                            drop_last=True, canvas_cache=cfg.canvas_cache)
    # train_split=1.0 leaves no val data: run without a val loader (train
    # loss drives checkpoint ranking) instead of evaluating an empty set
    val = None
    if len(va_idx):
        val = HostImageLoader(index, va_idx, batch_size=cfg.global_batch_size,
                              canvas=out_size, shuffle=False, drop_last=False,
                              canvas_cache=cfg.canvas_cache)
    test = None
    if cfg.test_dir and os.path.isdir(cfg.test_dir):
        t_index = scan_image_folder(cfg.test_dir)
        test = HostImageLoader(t_index, batch_size=cfg.global_batch_size,
                               canvas=out_size, shuffle=False, drop_last=False)
    return train, val, test, index


def export_for_serving(cfg: TrainConfig, trainer: Trainer, out_path: str,
                       epoch: int | None = None) -> str:
    """--transform: training checkpoint -> bare serving params
    (``ntrain.py:188-194`` / ``extract_ckpt.py`` analogue). Picks the best
    epoch by the monitored metric unless ``epoch`` is given. Writes a
    ``serving_meta.json`` beside the params carrying the training-time
    normalization statistics so serve normalizes identically."""
    import json

    ckpt = CheckpointManager(cfg.checkpoint, cfg.train_id)
    state = trainer.init_state()
    epoch = epoch if epoch is not None else (ckpt.best_epoch() or ckpt.latest_epoch())
    state = ckpt.restore(state, epoch)
    payload = {"params": state.params}
    if state.model_state:
        payload["model_state"] = state.model_state
    save_params(out_path, payload)
    meta = {
        "model_type": cfg.model_type,
        "epoch": int(epoch),
        "mean": list(cfg.augment.mean),
        "std": list(cfg.augment.std),
        "normalize_stats": cfg.normalize_stats,
    }
    # self-describing export: serve rebuilds the exact architecture and the
    # training-time class map from the metadata instead of guessing
    model_cfg = getattr(trainer.model, "cfg", None)
    if model_cfg is not None:
        import dataclasses as _dc

        from ..config import ViTConfig

        if isinstance(model_cfg, ViTConfig):
            meta["vit_config"] = _dc.asdict(model_cfg)
    try:
        from ..data.folder import get_class_to_idx

        meta["class_to_idx"] = get_class_to_idx(cfg.data_dir)
    except (FileNotFoundError, OSError):
        pass
    with open(os.path.join(os.path.abspath(out_path), "serving_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    ckpt.close()
    print(f"Exported epoch {epoch} serving params to {out_path}")
    return out_path


def standard_argparser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--restore", type=str, default=None,
                   help="resume from checkpoint dir (default: auto-resume)")
    p.add_argument("--no-resume", action="store_true",
                   help="start fresh even if checkpoints exist")
    p.add_argument("--test", action="store_true", help="evaluate on the test set")
    p.add_argument("--transform", type=str, default=None,
                   help="export best checkpoint to serving params at PATH and exit")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--canvas-cache", action="store_true",
                   help="decode each image once into the dataset's canvas "
                        "memmap (<data>/.tic_canvas_cache) and feed epochs "
                        "from it — pays decode once, not per epoch")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=None,
                   help="override the preset seed (split/shuffle/init/"
                        "augmentation streams — multi-seed A/Bs)")
    p.add_argument("--train-id", type=str, default=None,
                   help="override the preset train_id (checkpoint/log "
                        "lineage) — keeps multi-seed runs of one preset "
                        "from sharing a checkpoint directory")
    p.add_argument("--schedule", type=str, default=None,
                   choices=["constant", "warmup_linear", "step"])
    # multi-host launch (MULTIHOST.md): run the SAME command on every host.
    # On Cloud TPU pods jax auto-discovers the slice, so these are only
    # needed for manual clusters; JAX_COORDINATOR_ADDRESS env works too.
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator host:port for multi-host training")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def apply_overrides(cfg: TrainConfig, args) -> TrainConfig:
    import dataclasses

    over = {}
    if args.data_dir:
        over["data_dir"] = args.data_dir
    if args.max_epochs:
        over["max_epochs"] = args.max_epochs
    if args.batch_size:
        over["global_batch_size"] = args.batch_size
    if getattr(args, "canvas_cache", False):
        over["canvas_cache"] = True
    if getattr(args, "seed", None) is not None:
        over["seed"] = args.seed
    if getattr(args, "train_id", None):
        over["train_id"] = args.train_id
    opt_over = {}
    if getattr(args, "lr", None):
        opt_over["learning_rate"] = args.lr
    if getattr(args, "schedule", None):
        opt_over["schedule"] = args.schedule
    if opt_over:
        over["optimizer"] = dataclasses.replace(cfg.optimizer, **opt_over)
    return dataclasses.replace(cfg, **over) if over else cfg


def init_distributed_from_args(args) -> bool:
    """Multi-host init from the standard CLI flags / env vars.

    Unconditional and idempotent: initialize_distributed self-gates on its
    args OR the JAX_COORDINATOR_ADDRESS env var (gating on --coordinator
    alone would silently run N independent single-process trainings when
    the user launches via the env var). CLIs that touch the backend BEFORE
    calling ``run`` — e.g. ``load_pretrained_backbone``'s Orbax restore
    initializes XLA — must call this first; ``run`` calls it again
    harmlessly."""
    from ..parallel.dist import initialize_distributed

    return initialize_distributed(getattr(args, "coordinator", None),
                                  getattr(args, "num_processes", None),
                                  getattr(args, "process_id", None))


def run(cfg: TrainConfig, args, model=None, task=None, param_filter=None,
        init_params=None) -> Trainer:
    """The common --transform/--test/fit flow."""
    init_distributed_from_args(args)
    cfg = resolve_normalize_stats(cfg)
    trainer = Trainer(cfg, model=model, task=task, param_filter=param_filter,
                      init_params=init_params)

    if args.transform:
        export_for_serving(cfg, trainer, args.transform)
        return trainer

    train, val, test, _ = build_loaders(cfg, trainer.out_size)
    if args.test:
        # test-only mode against the latest checkpoint (the reference's
        # --test semantics, TIC/ResMoE/train.py:183-185)
        ckpt = CheckpointManager(cfg.checkpoint, cfg.train_id)
        state = trainer.init_state(train.steps_per_epoch())
        if ckpt.latest_epoch() is None:
            # evaluating scratch init would print a chance-level score as if
            # it were the trained model's — fail like fit's explicit-restore
            ckpt.close()
            raise FileNotFoundError(
                f"--test: no checkpoint for run {cfg.train_id!r} under "
                f"{cfg.checkpoint}")
        state = ckpt.restore(state)
        ckpt.close()
        trainer.state = state
        if test is None:
            if val is None:
                raise ValueError(
                    f"--test: test_dir {cfg.test_dir!r} not found and "
                    "train_split leaves no validation data to fall back on")
            print(f"--test: test_dir {cfg.test_dir!r} not found; evaluating "
                  "the VALIDATION split instead")
        result = trainer.test(test if test is not None else val)
        print(result)
        trainer.last_test_result = result  # machine-readable for tools
        return trainer

    trainer.fit(train, val, resume=(args.restore or not args.no_resume))
    return trainer
