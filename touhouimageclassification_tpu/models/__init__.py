"""Model families: ViT, ResNet, ResMoE, TreeViT.

``create_model`` is the single factory used by trainers and serving — it
mirrors the model-type dispatch of ``TIC/utils/serve.py:24-45`` (``get_model``)
so every reference model type resolves here.
"""
from __future__ import annotations

import dataclasses
from typing import Any

from ..config import NUM_CLASSES, MoEConfig, TreeViTConfig, vit_config
from .resnet import ResNet, resnet, resnet18, resnet34, resnet50, resnet101, resnet152
from .vit import ViT

__all__ = [
    "ViT", "ResNet", "resnet",
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "create_model", "apply_model",
]


def apply_model(model, variables, x, train: bool = False, rngs=None):
    """Uniform forward across families.

    Returns ``(outputs, new_model_state)`` where ``new_model_state`` carries
    updated non-param collections (ResNet ``batch_stats``) or ``{}``.
    ``outputs`` is logits for ViT/ResNet and the family-specific tuple for
    MoE/Tree (their tasks unpack it).
    """
    from .resnet import ResNet

    if isinstance(model, ResNet):
        if train:
            out, updates = model.apply(
                variables, x, train=True, mutable=["batch_stats"], rngs=rngs
            )
            return out, dict(updates)
        return model.apply(variables, x, train=False), {}
    out = model.apply(variables, x, deterministic=not train, rngs=rngs)
    return out, {}


def create_model(model_type: str, num_classes: int = NUM_CLASSES, **overrides: Any):
    """Resolve a model-type string to a Flax module.

    Known types (reference registry at ``TIC/utils/serve.py:18-45``):
    ``vit-base``, ``vit-large``, ``resnet18..152``, ``vit-moe``, ``tree-vit``.
    """
    mt = model_type.lower()
    if mt in ("vit-base", "vit-large") or mt.startswith("google/vit"):
        return ViT(vit_config(mt, num_classes=num_classes, **overrides))
    if mt.startswith("resnet"):
        depth = int(mt.removeprefix("resnet"))
        return resnet(depth, num_classes=num_classes, **overrides)
    if mt in ("vit-moe", "resmoe"):
        from .resmoe import MoEClassifier

        cfg = MoEConfig(num_classes=num_classes)
        cfg = dataclasses.replace(cfg, **overrides) if overrides else cfg
        return MoEClassifier(cfg)
    if mt in ("tree-vit", "treevit"):
        from .treevit import TreeViT

        cfg = TreeViTConfig(num_classes=num_classes)
        cfg = dataclasses.replace(cfg, **overrides) if overrides else cfg
        return TreeViT(cfg)
    raise ValueError(f"Unknown model type: {model_type}")
