"""Main-result ViT training (the ``TIC.ViT.ntrain`` equivalent).

``python -m touhouimageclassification_tpu.train.ntrain [--preset nvit] ...``

Presets map one-to-one to the reference launchers (``TIC/ViT/ntrain*.py``):
nvit (main result: ViT-Large, filtered data, full augmentation + CutMix/MixUp,
LR 1e-5, wd 0.01, 20 epochs), nvit_but_gen, nvit_but_div, nvit_but_mix,
nvit_unfiltered, nvit_unfiltered_unaug, nvit_unfiltered_unmix, nvit_grey,
nvit_grey_unmix. See ``config.PRESETS``.
"""
from __future__ import annotations

import dataclasses

from ..config import PRESETS, vit_config
from ..models.vit import ViT
from ..utils.pretrained import load_pretrained_backbone
from .cli import (apply_overrides, init_distributed_from_args, run,
                  standard_argparser)


def main(argv=None, preset: str = "nvit"):
    parser = standard_argparser("Train ViT with the ntrain recipe")
    parser.add_argument("--preset", type=str, default=preset,
                        choices=[k for k in PRESETS if k.startswith("nvit")])
    parser.add_argument("--no-pretrained", action="store_true",
                        help="scratch init instead of pretrained backbone")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize encoder layers (larger batches)")
    parser.add_argument("--freeze-backbone", action="store_true",
                        help="train the classifier head only "
                             "(full_finetune=False, ntrain.py:34-36)")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny ViT dims (CI/CPU smoke runs)")
    parser.add_argument("--small", action="store_true",
                        help="DeiT-Tiny-class dims at the full 224 input "
                             "(pixiv-scale grids on one chip)")
    args = parser.parse_args(argv)
    # before load_pretrained_backbone below: its Orbax restore initializes
    # the XLA backend, after which multi-host init hard-fails
    init_distributed_from_args(args)

    cfg = apply_overrides(PRESETS[args.preset], args)
    if args.freeze_backbone:
        cfg = dataclasses.replace(cfg, full_finetune=False)
    from .cli import dataset_num_classes

    vcfg = vit_config(cfg.model_type, num_classes=dataset_num_classes(cfg))
    if args.tiny:
        from .cli import TINY_VIT_DIMS

        vcfg = dataclasses.replace(vcfg, **TINY_VIT_DIMS)
    elif args.small:
        from .cli import SMALL_VIT_DIMS

        vcfg = dataclasses.replace(vcfg, **SMALL_VIT_DIMS)
    if args.remat:
        vcfg = dataclasses.replace(vcfg, remat=True)
    model = ViT(vcfg)
    init_params = None
    if cfg.pretrained and not args.no_pretrained:
        init_params = load_pretrained_backbone(cfg.model_type, vcfg.num_classes)
    return run(cfg, args, model=model, init_params=init_params)


if __name__ == "__main__":
    main()
