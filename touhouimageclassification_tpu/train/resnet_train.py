"""ResNet-152 training (the ``TIC.ResNet.train`` equivalent).

Reference recipe (``TIC/ResNet/train.py:213-241``): from-scratch resnet152,
SGD LR 5e-2 + StepLR(step_size=5 epochs, gamma=0.25), batch 80, 25 epochs,
256x256 inputs, per-epoch checkpoints with resume.
"""
from __future__ import annotations

from ..config import PRESETS
from .cli import apply_overrides, run, standard_argparser


def main(argv=None):
    parser = standard_argparser("Train ResNet-152 from scratch")
    parser.add_argument("--depth", type=int, default=152,
                        choices=[18, 34, 50, 101, 152])
    parser.add_argument("--bn-variant", default="flax",
                        choices=["flax", "batch", "ghost", "stale"],
                        help="BatchNorm statistics strategy (ops/batchnorm.py)"
                             ": 'flax' = reference parity; 'stale' normalizes"
                             " by the running EMA (+18.6%% step throughput "
                             "measured on chip, tools/bench_bn.py)")
    args = parser.parse_args(argv)
    cfg = apply_overrides(PRESETS["resnet152"], args)
    from ..models.resnet import resnet

    from .cli import dataset_num_classes

    model = resnet(args.depth, num_classes=dataset_num_classes(cfg),
                   bn_variant=args.bn_variant)
    return run(cfg, args, model=model)


if __name__ == "__main__":
    main()
