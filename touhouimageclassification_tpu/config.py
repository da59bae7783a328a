"""Typed configuration for the framework.

Replaces the reference's flat ``parameter.py`` constant modules
(``TIC/utils/parameter.py:1-16``, ``TIC/ResMoE/parameter.py``,
``TIC/TreeViT/parameter.py``) and the per-launcher UPPER_CASE kwargs of
``TIC/ViT/ntrain.py:159-267`` with frozen dataclasses. Every reference knob is
preserved by name (lower-cased) so each of the 8 ablation launchers
(``TIC/ViT/ntrain_*.py``) maps to exactly one preset in :data:`PRESETS`.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Mapping

# ---------------------------------------------------------------------------
# Global dataset/layout constants (reference: TIC/utils/parameter.py:1-16)
# ---------------------------------------------------------------------------

NUM_CLASSES = 120
IMAGE_SIZE = (256, 256)        # ResNet input size
VIT_IMAGE_SIZE = (224, 224)    # ViT input size

DATA_DIR = os.environ.get("TIC_DATA_DIR", "data/data_filtered_vit_base")
UNFILTERED_DATA_DIR = os.environ.get("TIC_UNFILTERED_DATA_DIR", "data/unfiltered")
FILTERED_DATA_DIR = DATA_DIR
TEST_DIR = os.environ.get("TIC_TEST_DIR", "data/testset")
CHECKPOINT_DIR = os.environ.get("TIC_CHECKPOINT_DIR", "checkpoint")
LOG_DIR = os.environ.get("TIC_LOG_DIR", "log")
CACHE_DIR = os.environ.get("TIC_CACHE_DIR", "cache")
RESULT_DIR = os.environ.get("TIC_RESULT_DIR", "result")

# ImageNet statistics used by every reference transform recipe
# (TIC/ViT/ntrain.py:101,111 etc.)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def get_image_size(model_type: str) -> tuple[int, int]:
    """Image-size dispatch per model family (TIC/utils/parameter.py:12-16)."""
    if "vit" in model_type.lower() or "moe" in model_type.lower() or "tree" in model_type.lower():
        return VIT_IMAGE_SIZE
    return IMAGE_SIZE


# ---------------------------------------------------------------------------
# Augmentation configuration (reference: AugmentedDataset, TIC/ViT/ntrain.py:68-157)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """The five transform recipes of the reference, knob-for-knob.

    ``enable_augmentation=False``        -> resize + normalize only
    ``only_grey_augmentation=True``      -> resize + random-grayscale(0.2)
    ``enable_diversity`` (color jitter + grayscale) and
    ``enable_generalization`` (random-resized-crop + hflip + random-erasing)
    combine exactly as in ``ntrain.py:96-136``.
    """

    enable_augmentation: bool = True
    enable_diversity: bool = True
    enable_generalization: bool = True
    only_grey_augmentation: bool = False

    # torchvision defaults used by the reference recipes
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    hue: float = 0.1
    grayscale_prob: float = 0.2
    hflip_prob: float = 0.5
    erasing_prob: float = 0.5
    erasing_scale: tuple[float, float] = (0.02, 0.33)
    erasing_ratio: tuple[float, float] = (0.3, 3.3)
    rrc_scale: tuple[float, float] = (0.08, 1.0)
    rrc_ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)

    mean: tuple[float, float, float] = IMAGENET_MEAN
    std: tuple[float, float, float] = IMAGENET_STD

    def __post_init__(self):
        if self.enable_augmentation and not self.only_grey_augmentation:
            if not (self.enable_diversity or self.enable_generalization):
                raise ValueError("Must select diversity or generalization!")


@dataclasses.dataclass(frozen=True)
class MixConfig:
    """Batch-level CutMix-or-MixUp (TIC/ViT/ntrain.py:30-33,45-46)."""

    enable_mixup: bool = True
    mixup_alpha: float = 1.0   # torchvision v2.MixUp default
    cutmix_alpha: float = 1.0  # torchvision v2.CutMix default


# ---------------------------------------------------------------------------
# Model configuration
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Architecture knobs. Defaults = ViT-Large/patch16-224 (the reference's
    main model, ``google/vit-large-patch16-224-in21k``, TIC/ViT/model.py:22)."""

    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    num_classes: int = NUM_CLASSES
    dropout_rate: float = 0.0
    attention_dropout_rate: float = 0.0
    layer_norm_eps: float = 1e-12   # HF ViT default
    # 'fused' (default) = slab-form Pallas kernels on TPU (fwd+bwd consume
    # the (B,N,3C) QKV tensor directly; part of the 242 -> 332 img/s ViT-L
    # train-step progression) with an XLA fallback off-TPU and when
    # attention_dropout_rate > 0; SPMD-partitionable over a batch-sharded
    # mesh (custom_partitioning, ops/attention.py).
    # 'flash' = legacy (B,N,H,D) Pallas kernel, also mesh-safe since round 3
    # (same custom_partitioning + custom_vmap wrapping as the slab kernels);
    # 'xla' = plain dot-product, 'xla_remat' = XLA with recomputed-backward
    # attention (both partition natively).
    attention_impl: str = "fused"
    # fused Pallas patch-embed kernel toggle ('pallas' is SPMD- and
    # vmap-safe too: batch-dim custom_partitioning, ops/patch_embed.py)
    patch_embed_impl: str = "xla"
    # rematerialize encoder layers in backward (jax.checkpoint): trades ~30%
    # extra FLOPs for O(layers) activation memory, enabling much larger
    # per-chip batches (HBM is the bottleneck, SURVEY §6 targets)
    remat: bool = False
    # remat policy: 'full' recomputes the whole layer; 'dots' saves matmul
    # outputs and recomputes only elementwise ops (cheap recompute, most of
    # the memory win). KNOWN TOOLCHAIN BUG: 'dots' crashes the axon remote
    # compile helper (HTTP 500) at every batch size — models.vit warns and
    # falls back to 'full' on that backend (perf ledger, CLAUDE.md).
    remat_policy: str = "full"
    # 'fast' (default) = erf numerics to ~1e-6 via the VPU's fast tanh with
    # a fitted argument polynomial — tanh-approximation speed (full train
    # step 306 vs 290 img/s) without its 4.7e-4 deviation; converted-torch
    # golden-logit parity passes at the same tolerance as the erf path
    # (tests/test_convert.py). 'exact' = XLA's erf expansion (the slowest
    # path on v5e); 'poly' = FMA-only erf-exact form (max err 8.3e-7;
    # measured no faster than 'exact' on v5e); 'tanh' = the conventional
    # approximation (a different function, max err 4.7e-4). See ops/gelu.py.
    gelu: str = "fast"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS


VIT_BASE = ViTConfig(hidden_size=768, num_layers=12, num_heads=12, mlp_dim=3072)
VIT_LARGE = ViTConfig()


def vit_config(name: str, **overrides) -> ViTConfig:
    """Map reference HF model names to architectures (TIC/ViT/model.py:22)."""
    base = {
        "google/vit-base-patch16-224": VIT_BASE,
        "google/vit-base-patch16-224-in21k": VIT_BASE,
        "google/vit-large-patch16-224-in21k": VIT_LARGE,
        "google/vit-large-patch16-224": VIT_LARGE,
        "vit-base": VIT_BASE,
        "vit-large": VIT_LARGE,
    }[name]
    return dataclasses.replace(base, **overrides)


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    """torchvision-compatible ResNet family (TIC/ResNet/model.py:17-276)."""

    depth: int = 152
    num_classes: int = NUM_CLASSES
    zero_init_residual: bool = False
    image_size: int = 256
    # BatchNorm statistics strategy: 'flax' (nn.BatchNorm, the default) or
    # the ops/batchnorm.py variants 'batch'/'ghost'/'stale' — the BN-cost
    # experiment knob (tools/bench_bn.py); checkpoints interchange freely
    bn_variant: str = "flax"


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    """ResMoE knobs (TIC/ResMoE/parameter.py:1-19)."""

    num_experts: int = 8
    top_k: int = 2
    expert_model_name: str = "google/vit-base-patch16-224"
    gateway_t: float = 0.01         # gate logit noise scale during training
    num_classes: int = NUM_CLASSES
    # 'dense'  = reference-parity: every expert computed, gate reweights
    #            (TIC/ResMoE/model.py:56-57)
    # 'sparse' = capacity-based top-k dispatch; shardable over an 'expert'
    #            mesh axis (expert parallelism, the TPU-native upgrade)
    routing: str = "dense"
    capacity_factor: float = 1.25   # sparse mode only
    # sparse-mode dispatch granularity:
    # 'image'   = gather routed images, each expert runs its full ViT on its
    #             capacity slots
    # 'feature' = every expert patch-embeds ALL images (per-expert weights,
    #             ~1.3% of ViT FLOPs), the token sequences of routed samples
    #             are gathered, and only the encoder runs at capacity — the
    #             gather moves (C, N, D) tokens instead of (C, H, W, 3)
    #             images and the patch embed stays a full-batch matmul
    dispatch_level: str = "feature"
    balance_loss_alpha: float = 0.5  # total_loss mix (TIC/ResMoE/train.py:36)
    # 'quadratic' = reference parity (TIC/ResMoE/train.py:26-28);
    # 'switch' = Switch-Transformer aux loss (train/losses.py) — measured
    # opt-in that prevents the winner-take-all collapse the quadratic
    # penalty allows at small scale (RESULTS.md cross-family section)
    balance_loss: str = "quadratic"
    sce_alpha: float = 0.1          # symmetric CE (TIC/ResMoE/train.py:21)
    sce_beta: float = 1.0
    # architecture override for experts/gate (None = expert_model_name's ViT);
    # used to build tiny MoEs in tests and the multichip dryrun
    expert_vit: "ViTConfig | None" = None


@dataclasses.dataclass(frozen=True)
class TreeViTConfig:
    """TreeViT knobs (TIC/TreeViT/parameter.py:1-17)."""

    num_categories: int = 8
    num_classes: int = NUM_CLASSES
    top_k: int = 2
    map_file: str = "category.csv"
    capacity_factor: float = 1.5
    # deterministic (eval/serve) forward runs every son densely and combines
    # with the top-k weights — reference-exact, no capacity drops (a dropped
    # sample at serve time argmaxes all-zero logits to class 0). False keeps
    # capacity dispatch at eval for training-cost parity.
    eval_dense: bool = True
    # architecture override for root/sons (None = ViT-Base)
    vit: "ViTConfig | None" = None


# ---------------------------------------------------------------------------
# Training configuration
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Covers both reference optimizer styles: AdamW (ViT paths,
    ntrain.py:39-41 / finetune.py:314-328) and SGD+StepLR (ResNet,
    TIC/ResNet/train.py:240-241)."""

    name: str = "adamw"                 # 'adamw' | 'sgd'
    learning_rate: float = 1e-5
    weight_decay: float = 0.01
    momentum: float = 0.0               # sgd only
    # schedule: 'constant' | 'warmup_linear' (finetune.py warmup 500 steps)
    #           | 'step' (StepLR step_size=5 epochs, gamma=0.25)
    schedule: str = "constant"
    warmup_steps: int = 500
    total_steps: int = 0                # required by warmup_linear
    step_lr_epoch_size: int = 5
    step_lr_gamma: float = 0.25
    grad_accum_steps: int = 1           # optax.MultiSteps
    max_grad_norm: float = 0.0          # 0 = off (reference does not clip)


@dataclasses.dataclass(frozen=True)
class CheckpointConfig:
    """Retention semantics of the reference's dual ModelCheckpoint callbacks
    (ntrain.py:221-236), mapped onto one Orbax manager: keep the top-k
    checkpoints by the monitored metric, plus every ``every_n_epochs``-th
    checkpoint (Orbax ``keep_period``)."""

    directory: str = CHECKPOINT_DIR
    top_k: int = 3
    monitor: str = "val_acc"
    mode: str = "max"
    every_n_epochs: int = 3
    async_save: bool = True


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. The reference is single-device (devices=1,
    ntrain.py:240); here DP over ICI is the default scale axis and EP is
    available for sparse MoE."""

    data_axis: str = "data"
    expert_axis: str = "expert"
    num_expert_shards: int = 1   # 1 = pure DP


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    train_id: str = "nViT"
    model_type: str = "vit-large"
    pretrained: bool = True
    full_finetune: bool = True          # False freezes the backbone (ntrain.py:34-36)

    data_dir: str = DATA_DIR
    test_dir: str = TEST_DIR
    train_split: float = 0.8
    seed: int = 42                      # L.seed_everything(42), ntrain.py:186
    # cache decoded uint8 canvases in a memmap under the dataset dir so only
    # epoch 1 pays JPEG decode (lossless: augmentation is on-device; costs
    # ~N*canvas²*3 bytes of disk — ~26 GB for the full 132k corpus)
    canvas_cache: bool = False
    # 'imagenet' = the fixed ImageNet statistics every ntrain recipe uses
    # (ntrain.py:101); 'dataset' = per-dataset mean/std computed and cached
    # like the hand-rolled paths (preprocess.py get_transforms). The value
    # used is exported with serving params so serve normalizes identically.
    normalize_stats: str = "imagenet"

    global_batch_size: int = 8
    max_epochs: int = 20
    limit_train_batches: int = 0        # 0 = no limit
    limit_val_batches: int = 0

    optimizer: OptimizerConfig = OptimizerConfig()
    augment: AugmentConfig = AugmentConfig()
    mix: MixConfig = MixConfig()
    checkpoint: CheckpointConfig = CheckpointConfig()
    mesh: MeshConfig = MeshConfig()

    # bf16 compute / f32 params is TPU-native; mirrors 'bf16-mixed'
    # (ntrain.py:241) without GradScaler
    compute_dtype: str = "bfloat16"
    # >1 fuses k optimizer steps into one jitted lax.scan call (k prefetched
    # batches stacked on a leading axis): amortizes per-call dispatch
    # overhead; metrics are averaged over the k steps
    steps_per_call: int = 1
    # NaN guard: skip non-finite updates (finetune.py:181-188 analogue)
    nan_guard: bool = True
    early_stop_patience: int = 3        # EarlyStopping(patience=3), ntrain.py:237-238
    early_stop_monitor: str = "val_acc"
    early_stop_mode: str = "max"
    # False (default): Lightning EarlyStopping semantics — patience epochs
    # since the GLOBAL best (ntrain.py:237-238). True: the hand-rolled
    # loops' window rule (finetune.py:79-91 / pretrain.py / ResNet/train.py)
    # — stop when none of the last `patience` epochs improved on the value
    # recorded just before that window (global best is irrelevant).
    early_stop_window: bool = False
    log_dir: str = LOG_DIR
    # jax.profiler trace dir for the first profiled epoch; '' = off (the
    # reference's disabled-by-default profiler knob, TIC/ResMoE/parameter.py:14)
    profile_dir: str = ""
    profile_steps: int = 8              # steps traced when profiling is on


# ---------------------------------------------------------------------------
# Ablation presets — one per reference launcher (TIC/ViT/ntrain*.py) plus the
# hand-rolled loops (finetune/pretrain/ResNet).
# ---------------------------------------------------------------------------

def _nvit(train_id: str, **over) -> TrainConfig:
    """Base = main result run (ntrain.py:250-267: ViT-Large, LR 1e-5, wd 0.01,
    batch 8, 20 epochs, filtered data, full augmentation + mixup)."""
    aug = over.pop("augment", AugmentConfig())
    mix = over.pop("mix", MixConfig())
    return TrainConfig(
        train_id=train_id,
        model_type="vit-large",
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-5, weight_decay=0.01),
        augment=aug,
        mix=mix,
        **over,
    )


PRESETS: Mapping[str, TrainConfig] = {
    # main result (ntrain.py)
    "nvit": _nvit("nViT"),
    # ablations (TIC/ViT/ntrain_but_gen.py etc.)
    "nvit_but_gen": _nvit("nViT_but_gen", augment=AugmentConfig(enable_generalization=False)),
    "nvit_but_div": _nvit("nViT_but_div", augment=AugmentConfig(enable_diversity=False)),
    "nvit_but_mix": _nvit("nViT_but_mix", mix=MixConfig(enable_mixup=False)),
    "nvit_unfiltered": _nvit("nViT_unfiltered", data_dir=UNFILTERED_DATA_DIR),
    "nvit_unfiltered_unaug": _nvit(
        "nViT_unfiltered_unaug",
        data_dir=UNFILTERED_DATA_DIR,
        augment=AugmentConfig(enable_augmentation=False),
        mix=MixConfig(enable_mixup=False),
    ),
    "nvit_unfiltered_unmix": _nvit(
        "nViT_unfiltered_unmix", data_dir=UNFILTERED_DATA_DIR, mix=MixConfig(enable_mixup=False)
    ),
    "nvit_grey": _nvit("nViT_grey", augment=AugmentConfig(only_grey_augmentation=True)),
    "nvit_grey_unmix": _nvit(
        "nViT_grey_unmix",
        augment=AugmentConfig(only_grey_augmentation=True),
        mix=MixConfig(enable_mixup=False),
    ),
    # hand-rolled ViT-Base/Large finetune (TIC/ViT/finetune.py:271-342:
    # epochs 40, batch 30, LR 1e-5, AdamW wd 0.01, warmup 500, unfiltered)
    "finetune_vit_base": TrainConfig(
        train_id="ViT_finetune",
        normalize_stats="dataset",
        model_type="vit-base",
        data_dir=UNFILTERED_DATA_DIR,
        train_split=0.9,
        seed=0,
        global_batch_size=30,
        max_epochs=40,
        optimizer=OptimizerConfig(
            name="adamw", learning_rate=1e-5, weight_decay=0.01, schedule="warmup_linear"
        ),
        augment=AugmentConfig(enable_augmentation=False),
        mix=MixConfig(enable_mixup=False),
        # finetune.py:288 sets MAX_TOLERANT_EPOCH = NUM_EPOCHS, i.e. the
        # window early-exit is wired but effectively disabled for this run
        early_stop_patience=40,
        early_stop_window=True,
        early_stop_monitor="val_loss",
        early_stop_mode="min",
    ),
    # scratch pretrain (TIC/ViT/pretrain.py:272-340: 60 epochs, batch 80, LR 1e-4)
    "pretrain_vit": TrainConfig(
        train_id="ViT_pretrain",
        normalize_stats="dataset",
        model_type="vit-base",
        pretrained=False,
        data_dir=UNFILTERED_DATA_DIR,
        train_split=0.9,
        seed=0,
        global_batch_size=80,
        max_epochs=60,
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-4, weight_decay=0.01),
        augment=AugmentConfig(enable_augmentation=False),
        mix=MixConfig(enable_mixup=False),
        early_stop_patience=3,          # MAX_TOLERANT_EPOCH=3, pretrain.py:289
        early_stop_window=True,
        early_stop_monitor="val_loss",
        early_stop_mode="min",
    ),
    # ResNet-152 (TIC/ResNet/train.py:213-241: SGD 5e-2 StepLR(5, 0.25),
    # batch 80, 25 epochs, 256x256)
    "resnet152": TrainConfig(
        train_id="ResNet_train",
        normalize_stats="dataset",
        model_type="resnet152",
        pretrained=False,
        data_dir=UNFILTERED_DATA_DIR,
        train_split=0.9,
        seed=0,
        global_batch_size=80,
        max_epochs=25,
        optimizer=OptimizerConfig(
            name="sgd", learning_rate=5e-2, weight_decay=0.0, schedule="step"
        ),
        augment=AugmentConfig(enable_augmentation=False),
        mix=MixConfig(enable_mixup=False),
        early_stop_patience=3,          # MAX_TOLERANT_EPOCH=3, ResNet/train.py:221
        early_stop_window=True,
        early_stop_monitor="val_loss",
        early_stop_mode="min",
    ),
    # ResMoE (TIC/ResMoE/parameter.py: batch 4 x accum 4, 10 epochs, SGD 5e-2,
    # limit 500 train / 100 val batches)
    "resmoe": TrainConfig(
        train_id="ResMoE",
        model_type="vit-moe",
        global_batch_size=4,
        max_epochs=10,
        limit_train_batches=500,
        limit_val_batches=100,
        optimizer=OptimizerConfig(name="sgd", learning_rate=5e-2, grad_accum_steps=4),
        augment=AugmentConfig(enable_augmentation=False),
        mix=MixConfig(enable_mixup=False),
        checkpoint=CheckpointConfig(top_k=3, every_n_epochs=3, monitor="val_loss", mode="min"),
        early_stop_monitor="val_loss",
        early_stop_mode="min",
    ),
    # TreeViT (TIC/TreeViT/parameter.py; trainer fixed per SURVEY §"bugs")
    "treevit": TrainConfig(
        train_id="TreeViT",
        model_type="tree-vit",
        global_batch_size=4,
        max_epochs=2,
        limit_train_batches=100,
        limit_val_batches=100,
        optimizer=OptimizerConfig(name="sgd", learning_rate=5e-2, grad_accum_steps=4),
        augment=AugmentConfig(enable_augmentation=False),
        mix=MixConfig(enable_mixup=False),
        checkpoint=CheckpointConfig(top_k=10, every_n_epochs=3,
                                    monitor="val_loss", mode="min"),
        early_stop_monitor="val_loss",
        early_stop_mode="min",
    ),
}
