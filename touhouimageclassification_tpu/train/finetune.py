"""Hand-rolled-style ViT finetune (the ``TIC.ViT.finetune`` equivalent).

Reference recipe (``TIC/ViT/finetune.py:271-342``): ViT-Base on unfiltered
data, AdamW LR 1e-5 wd 0.01, per-step linear warmup (500 steps), batch 30,
up to 40 epochs, val-loss window early exit, per-epoch checkpoints with
filesystem auto-resume. This produces the dataset-filter judge model
(README step 2). The unified Trainer supplies the loop; this module wires
the preset and the warmup schedule's total step count.
"""
from __future__ import annotations

import dataclasses

from ..config import PRESETS, vit_config
from ..models.vit import ViT
from ..utils.pretrained import load_pretrained_backbone
from .cli import (apply_overrides, init_distributed_from_args, run,
                  standard_argparser)


def main(argv=None, preset: str = "finetune_vit_base"):
    parser = standard_argparser("ViT finetune (hand-rolled recipe)")
    parser.add_argument("--no-pretrained", action="store_true")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny ViT dims (CI/CPU smoke runs)")
    parser.add_argument("--small", action="store_true",
                        help="DeiT-Tiny-class dims at the full 224 input "
                             "(pixiv-scale grids on one chip)")
    args = parser.parse_args(argv)
    # before load_pretrained_backbone below: its Orbax restore initializes
    # the XLA backend, after which multi-host init hard-fails
    init_distributed_from_args(args)

    cfg = apply_overrides(PRESETS[preset], args)
    from .cli import dataset_num_classes

    vcfg = vit_config(cfg.model_type, num_classes=dataset_num_classes(cfg))
    if args.tiny:
        from .cli import TINY_VIT_DIMS

        vcfg = dataclasses.replace(vcfg, **TINY_VIT_DIMS)
    elif args.small:
        from .cli import SMALL_VIT_DIMS

        vcfg = dataclasses.replace(vcfg, **SMALL_VIT_DIMS)
    model = ViT(vcfg)
    init_params = None
    if cfg.pretrained and not args.no_pretrained:
        init_params = load_pretrained_backbone(cfg.model_type, vcfg.num_classes)
    if cfg.optimizer.schedule == "warmup_linear" and not args.transform:
        # warmup_linear needs the horizon (transformers
        # get_linear_schedule_with_warmup analogue, finetune.py:318-328)
        from ..data.folder import scan_image_folder

        n = len(scan_image_folder(cfg.data_dir))
        steps = int(n * cfg.train_split) // cfg.global_batch_size
        cfg = dataclasses.replace(
            cfg, optimizer=dataclasses.replace(
                cfg.optimizer, total_steps=steps * cfg.max_epochs
            )
        )
    run(cfg, args, model=model, init_params=init_params)


if __name__ == "__main__":
    main()
