"""ResMoE training (the ``TIC.ResMoE.train`` equivalent).

Reference recipe (``TIC/ResMoE/train.py`` + ``parameter.py``): 8 ViT-Base
experts, top-2 ViT-Base gate, SGD 5e-2, batch 4 x grad-accum 4, 10 epochs,
500/100 train/val batches per epoch, symmetric CE + 0.5*load-balance loss,
dual checkpointing, --restore/--test/--transform CLI.

TPU upgrades: ``--routing sparse`` switches the dense reference compute to
capacity-based top-k dispatch, and ``--expert-shards N`` shards the stacked
expert axis over the mesh's ``expert`` axis (expert parallelism).
"""
from __future__ import annotations

import dataclasses

from ..config import PRESETS, MeshConfig, MoEConfig
from ..models.resmoe import MoEClassifier
from .cli import apply_overrides, run, standard_argparser
from .tasks import MoETask


def main(argv=None):
    parser = standard_argparser("Train the ResMoE mixture of ViT experts")
    parser.add_argument("--routing", type=str, default="dense",
                        choices=["dense", "sparse"])
    parser.add_argument("--dispatch-level", type=str, default="feature",
                        choices=["feature", "image"],
                        help="sparse-mode granularity: gather routed token "
                             "sequences after per-expert patch embed "
                             "(feature) or gather raw images (image)")
    parser.add_argument("--num-experts", type=int, default=8)
    parser.add_argument("--top-k", type=int, default=2)
    parser.add_argument("--expert-shards", type=int, default=1,
                        help="shard experts over this many devices (EP)")
    parser.add_argument("--balance-loss", type=str, default="quadratic",
                        choices=["quadratic", "switch"],
                        help="gate balance penalty: reference quadratic "
                             "usage penalty, or the Switch-Transformer aux "
                             "loss (prevents gate collapse at small scale)")
    parser.add_argument("--balance-alpha", type=float, default=None,
                        help="balance-loss mix weight (default: preset's "
                             "0.5)")
    parser.add_argument("--gateway-t", type=float, default=None,
                        help="training-time gate logit noise scale "
                             "(reference default 0.01; the balance study "
                             "raises it to flip top-k selections out of a "
                             "collapsed equilibrium)")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny ViT dims (CI/CPU smoke runs)")
    parser.add_argument("--small", action="store_true",
                        help="DeiT-Tiny-class expert dims at the full 224 "
                             "input (pixiv-scale runs on one chip)")
    args = parser.parse_args(argv)

    cfg = apply_overrides(PRESETS["resmoe"], args)
    cfg = dataclasses.replace(
        cfg, mesh=MeshConfig(num_expert_shards=args.expert_shards)
    )
    expert_vit = None
    if args.tiny:
        from ..config import ViTConfig
        from .cli import TINY_VIT_DIMS

        expert_vit = ViTConfig(**TINY_VIT_DIMS)
    elif args.small:
        from ..config import ViTConfig
        from .cli import SMALL_VIT_DIMS

        expert_vit = ViTConfig(**SMALL_VIT_DIMS)
    from .cli import dataset_num_classes

    moe_cfg = MoEConfig(num_experts=args.num_experts, top_k=args.top_k,
                        routing=args.routing,
                        dispatch_level=args.dispatch_level,
                        expert_vit=expert_vit,
                        balance_loss=args.balance_loss,
                        num_classes=dataset_num_classes(cfg))
    if args.balance_alpha is not None:
        moe_cfg = dataclasses.replace(moe_cfg,
                                      balance_loss_alpha=args.balance_alpha)
    if args.gateway_t is not None:
        moe_cfg = dataclasses.replace(moe_cfg, gateway_t=args.gateway_t)
    model = MoEClassifier(moe_cfg)
    return run(cfg, args, model=model, task=MoETask(moe_cfg))


if __name__ == "__main__":
    main()
