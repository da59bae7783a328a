"""Pretrained-backbone resolution without network access.

Replaces ``ensure()`` (``TIC/utils/ensure.py:11-15``, which downloads HF
snapshots on demand): this environment has zero egress, so pretrained weights
must already exist locally — as a converted Orbax params dir or an HF
snapshot directory (safetensors/bin) under ``CACHE_DIR``. Returns None (with
a warning) when nothing is found, so training falls back to scratch init —
the reference's ``pretrained=False`` path.
"""
from __future__ import annotations

import glob
import os
import warnings

import numpy as np

from ..config import CACHE_DIR, vit_config

_HF_NAMES = {
    "vit-base": "google/vit-base-patch16-224-in21k",
    "vit-large": "google/vit-large-patch16-224-in21k",
}


def _adapt_head(params: dict, hidden: int, num_classes: int, seed: int = 0) -> dict:
    head = params.get("head", {})
    kern = head.get("kernel")
    if kern is not None and np.asarray(kern).shape[-1] == num_classes:
        return params
    rng = np.random.default_rng(seed)
    params = dict(params)
    params["head"] = {
        "kernel": rng.normal(0.0, 0.02, (hidden, num_classes)).astype(np.float32),
        "bias": np.zeros((num_classes,), np.float32),
    }
    return params


def load_pretrained_backbone(model_type: str, num_classes: int,
                             cache_dir: str = CACHE_DIR):
    """Locate + load pretrained ViT weights for ``model_type``; adapts the
    classifier head to ``num_classes`` (ignore_mismatched_sizes semantics)."""
    hf_name = _HF_NAMES.get(model_type, model_type)
    safe = hf_name.replace("/", "--")
    cfg = vit_config(model_type)

    # 1) converted Orbax params dir. Checked by CONTENT, not just name: a
    # raw HF snapshot dropped at this exact path (it is where utils/convert
    # writes, so a natural place to put one) must fall through to the
    # snapshot scan below rather than crash Orbax's restore with an opaque
    # missing-_METADATA error.
    orbax_dir = os.path.join(cache_dir, safe)
    if any(os.path.exists(os.path.join(orbax_dir, marker))
           for marker in ("_METADATA", "_CHECKPOINT_METADATA",
                          "manifest.ocdbt")):
        from ..train.checkpoint import load_params

        restored = load_params(orbax_dir)
        params = restored.get("params", restored)
        return _adapt_head(params, cfg.hidden_size, num_classes)

    # 2) HF snapshot directory (hub cache layout or a plain dir)
    candidates = [
        os.path.join(cache_dir, f"models--{safe}"),
        os.path.join(cache_dir, hf_name),
        os.path.join(cache_dir, os.path.basename(hf_name)),
        orbax_dir,
    ]
    for cand in candidates:
        if not os.path.isdir(cand):
            continue
        weights = sorted(
            glob.glob(os.path.join(cand, "**", "*.safetensors"), recursive=True)
            # pytorch_model*.bin, not pytorch_model.bin: sharded snapshots
            # (pytorch_model-00001-of-000NN.bin) must be SEEN so the shard
            # check below can reject them loudly instead of silently
            # reporting "no pretrained weights"
            + glob.glob(os.path.join(cand, "**", "pytorch_model*.bin"),
                        recursive=True)
        )
        if not weights:
            continue
        # prefer any complete single-file checkpoint; only raise on shards
        # when NOTHING non-sharded coexists (a hub cache often holds
        # model.safetensors next to pytorch_model-0000N-of-000NN.bin)
        whole = [w for w in weights if "-of-" not in os.path.basename(w)]
        if not whole:
            raise ValueError(
                f"sharded checkpoint under {cand} ({len(weights)} files); "
                "loading one shard would silently drop weights — merge it "
                "or convert with utils/convert first")
        weights = whole
        if len(weights) > 1:
            # hub caches can hold several snapshot revisions: sorted order
            # makes the pick deterministic, but say which file won
            warnings.warn(
                f"{len(weights)} weight files under {cand}; loading "
                f"{weights[0]}", stacklevel=2)
        sd = _load_state_dict(weights[0])
        from .convert import torch_vit_to_flax

        return torch_vit_to_flax(sd, num_classes)

    warnings.warn(
        f"No pretrained weights for {model_type} under {cache_dir}; "
        "training from scratch. Convert a checkpoint with "
        "`python -m touhouimageclassification_tpu.utils.convert` or place an "
        "HF snapshot in the cache dir.",
        stacklevel=2,
    )
    return None


def _load_state_dict(path: str):
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        return load_file(path)
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def ensure(model_name: str, cache_dir: str = CACHE_DIR) -> str:
    """Name-compat shim for the reference's ``ensure``: returns a local path
    for the model if cached, else raises with conversion instructions."""
    safe = model_name.replace("/", "--")
    for cand in (os.path.join(cache_dir, safe),
                 os.path.join(cache_dir, f"models--{safe}")):
        if os.path.isdir(cand):
            return cand
    raise FileNotFoundError(
        f"{model_name} not cached under {cache_dir} and downloads are "
        "unavailable; convert local weights via utils/convert.py"
    )
